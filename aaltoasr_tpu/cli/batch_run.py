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


def slurm_script(cmd, batches, failed_list, log_dir="logs",
                 sbatch_extra=""):
    """sbatch array script implementing the ClusterManager protocol:
    one array task per batch, failures appended to the failed list
    (`ClusterManager.pm:42-115` submit_batches + grant files;
    `pyrectool/submit-to-slurm.sh` array submission)."""
    run = " ".join(
        c.replace("{B}", str(batches))
        .replace("{I}", "${SLURM_ARRAY_TASK_ID}") for c in cmd)
    extra = f"#SBATCH {sbatch_extra}\n" if sbatch_extra else ""
    return (
        "#!/bin/bash\n"
        f"#SBATCH --no-requeue\n"
        f"#SBATCH --array=1-{batches}\n"
        f"#SBATCH -o {log_dir}/batch.stdout.%a\n"
        f"#SBATCH -e {log_dir}/batch.stderr.%a\n"
        f"{extra}"
        f"{run}\n"
        "rc=$?\n"
        f"if [ $rc -ne 0 ]; then echo ${{SLURM_ARRAY_TASK_ID}} >> "
        f"{failed_list}; fi\n"
        "exit $rc\n")


def submit_slurm(args, cmd) -> int:
    """Submit the batch array via sbatch --wait, rerunning failed
    batches up to --retries times (the ClusterManager retry loop)."""
    os.makedirs(args.log_dir, exist_ok=True)
    script = slurm_script(cmd, args.batches, args.failed_list,
                          args.log_dir, args.sbatch_args)
    script_path = os.path.join(args.log_dir, "batch_array.sh")
    with open(script_path, "w") as f:
        f.write(script)
    if args.dry_run:
        print(script)
        print(f"sbatch --wait {script_path}")
        return 0
    array = f"1-{args.batches}"
    for attempt in range(args.retries + 1):
        if os.path.exists(args.failed_list):
            os.remove(args.failed_list)
        rc = subprocess.run(
            ["sbatch", "--wait", f"--array={array}", script_path]
        ).returncode
        if rc == 0 and not os.path.exists(args.failed_list):
            return 0
        if not os.path.exists(args.failed_list):
            print(f"sbatch failed (rc {rc})", file=sys.stderr)
            return rc or 1
        failed = sorted({int(x) for x in
                         open(args.failed_list).read().split()})
        if attempt < args.retries:
            print(f"retrying {len(failed)} failed batch(es): {failed}",
                  file=sys.stderr)
            array = ",".join(str(i) for i in failed)
    print(f"batches failed after retries: {failed}", file=sys.stderr)
    return 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="batch_run")
    p.add_argument("-B", "--batches", type=int, required=True)
    p.add_argument("-j", "--jobs", type=int, default=1,
                   help="concurrent shard processes")
    p.add_argument("--retries", type=int, default=1,
                   help="failed batch retry count (ClusterManager.pm)")
    p.add_argument("--failed-list", default="failed_batches.lst")
    p.add_argument("--submit", choices=["local", "slurm"],
                   default="local",
                   help="slurm: emit + sbatch an array script "
                        "(submit-to-slurm.sh / ClusterManager.pm)")
    p.add_argument("--sbatch-args", default="",
                   help="extra #SBATCH line; pass with '=' (e.g. "
                        "--sbatch-args='--mem-per-cpu=8G "
                        "--time=4:00:00')")
    p.add_argument("--log-dir", default="logs")
    p.add_argument("--dry-run", action="store_true",
                   help="print the generated sbatch script and exit")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="command template with {B} and {I}")
    args = p.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        raise SystemExit("batch_run: no command given")
    if args.submit == "slurm":
        return submit_slurm(args, cmd)

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
