"""batch_run: sharded batch execution with failed-batch retry.

The operational layer of the reference: SLURM/Condor job arrays with
per-batch failure files and retries (`aku/scripts/ClusterManager.pm:42-
205` failed_batch_retry_count, `pyrectool/submit-to-{slurm,condor}.sh`,
train.pl:345-396).  On a TPU host the "array" is local worker processes
over the same ``-B/-I`` recipe shards; failures append to
``failed_batches.lst`` and failed shards retry up to ``--retries`` times
— the same protocol, minus the cluster scheduler.

Usage: batch_run -B 8 [--retries 2] -- python -m aaltoasr_tpu.cli.stats
       -c cfg -r recipe -o out_{I} -B {B} -I {I}
``{B}``/``{I}`` in the command expand to the shard parameters.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def run_shard(cmd_template, B, I) -> int:
    cmd = [c.replace("{B}", str(B)).replace("{I}", str(I))
           for c in cmd_template]
    return subprocess.run(cmd).returncode


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="batch_run")
    p.add_argument("-B", "--batches", type=int, required=True)
    p.add_argument("-j", "--jobs", type=int, default=1,
                   help="concurrent shard processes")
    p.add_argument("--retries", type=int, default=1,
                   help="failed batch retry count (ClusterManager.pm)")
    p.add_argument("--failed-list", default="failed_batches.lst")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="command template with {B} and {I}")
    args = p.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        raise SystemExit("batch_run: no command given")

    pending = list(range(1, args.batches + 1))
    for attempt in range(args.retries + 1):
        failed = []
        running = {}
        queue = list(pending)
        while queue or running:
            while queue and len(running) < args.jobs:
                i = queue.pop(0)
                c = [x.replace("{B}", str(args.batches))
                     .replace("{I}", str(i)) for x in cmd]
                running[i] = subprocess.Popen(c)
            done = []
            for i, proc in running.items():
                rc = proc.poll()
                if rc is not None:
                    done.append(i)
                    if rc != 0:
                        failed.append(i)
                        print(f"batch {i} failed (rc {rc})",
                              file=sys.stderr)
            for i in done:
                del running[i]
            if running:
                import time
                time.sleep(0.2)
        if not failed:
            if os.path.exists(args.failed_list):
                os.remove(args.failed_list)
            return 0
        with open(args.failed_list, "w") as f:
            for i in failed:
                f.write(f"{i}\n")
        if attempt < args.retries:
            print(f"retrying {len(failed)} failed batch(es)",
                  file=sys.stderr)
            pending = failed
    print(f"batches failed after retries: {failed}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
