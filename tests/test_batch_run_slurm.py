"""batch_run --submit slurm: sbatch array generation + the
ClusterManager retry protocol (`ClusterManager.pm:42-115`,
`pyrectool/submit-to-slurm.sh`), tested against a fake sbatch."""

import os
import stat
import sys

from aaltoasr_tpu.cli.batch_run import main, slurm_script


class TestSlurmScript:
    def test_script_shape(self):
        s = slurm_script(["python", "work.py", "-B", "{B}", "-I", "{I}"],
                         8, "failed.lst", "logs", "--mem-per-cpu=8G")
        assert "#SBATCH --array=1-8" in s
        assert "#SBATCH --no-requeue" in s
        assert "#SBATCH --mem-per-cpu=8G" in s
        assert "-B 8 -I ${SLURM_ARRAY_TASK_ID}" in s
        assert ">> failed.lst" in s
        assert "-o logs/batch.stdout.%a" in s

    def test_dry_run_prints_script(self, tmp_path, capsys):
        rc = main(["-B", "4", "--submit", "slurm", "--dry-run",
                   "--log-dir", str(tmp_path / "logs"),
                   "--failed-list", str(tmp_path / "f.lst"),
                   "--", "echo", "{I}"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "#SBATCH --array=1-4" in out
        assert "sbatch --wait" in out
        assert (tmp_path / "logs" / "batch_array.sh").exists()


class TestSlurmSubmitRetry:
    def _fake_sbatch(self, tmp_path, monkeypatch):
        """A fake sbatch that runs the array locally, failing batch 2
        on the first round (state file marks the retry)."""
        sb = tmp_path / "bin"
        sb.mkdir()
        state = tmp_path / "round"
        script = sb / "sbatch"
        script.write_text(f"""#!/bin/bash
# fake sbatch: parse --array=..., run the script per task id
array=""
for a in "$@"; do
  case "$a" in --array=*) array="${{a#--array=}}";; esac
done
shift $(($# - 1)); job="$1"
ids=$(python3 - "$array" <<'EOF'
import sys
spec = sys.argv[1]
out = []
for part in spec.split(','):
    if '-' in part:
        a, b = part.split('-'); out += list(range(int(a), int(b) + 1))
    else:
        out.append(int(part))
print(' '.join(map(str, out)))
EOF
)
for i in $ids; do
  SLURM_ARRAY_TASK_ID=$i bash "$job" || true
done
echo "Submitted batch job 42"
exit 0
""")
        script.chmod(script.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv(
            "PATH", f"{sb}:{os.environ['PATH']}")
        return state

    def test_failed_batch_retried(self, tmp_path, monkeypatch):
        state = self._fake_sbatch(tmp_path, monkeypatch)
        marker = tmp_path / "ran"
        # worker: batch 2 fails unless the retry marker exists
        worker = tmp_path / "work.sh"
        worker.write_text(f"""#!/bin/bash
i="$1"
echo "$i" >> {marker}
if [ "$i" = "2" ] && [ ! -f {state} ]; then
  touch {state}
  exit 1
fi
exit 0
""")
        worker.chmod(worker.stat().st_mode | stat.S_IEXEC)
        monkeypatch.chdir(tmp_path)
        rc = main(["-B", "3", "--submit", "slurm", "--retries", "1",
                   "--log-dir", str(tmp_path / "logs"),
                   "--failed-list", str(tmp_path / "f.lst"),
                   "--", "bash", str(worker), "{I}"])
        assert rc == 0
        runs = marker.read_text().split()
        # 3 first-round runs + 1 retry of batch 2
        assert runs == ["1", "2", "3", "2"]
        assert not (tmp_path / "f.lst").exists()
