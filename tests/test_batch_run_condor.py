"""batch_run --submit condor: job-description generation + the
condor_submit/condor_wait/condor_rm protocol
(`pyrectool/submit-to-condor.sh:30-60`, `pyrectool/exec-line.sh`),
tested against fake condor binaries."""

import os
import stat

from aaltoasr_tpu.cli.batch_run import condor_files, main


class TestCondorFiles:
    def test_description_shape(self, tmp_path):
        desc, cmds, wrapper, script, logfile = condor_files(
            ["python", "work.py", "-B", "{B}", "-I", "{I}"],
            [1, 2, 3, 4], 4, "failed.lst", str(tmp_path))
        assert f"executable = {tmp_path}/exec_line.sh" in desc
        assert f"arguments = {tmp_path}/condor_cmds.sh $(Process)" in desc
        assert f"log = {tmp_path}/condor.log\n" in desc
        assert f"output = {tmp_path}/condor.log.out.$(Process)" in desc
        assert f"error = {tmp_path}/condor.log.err.$(Process)" in desc
        assert "queue 4" in desc
        lines = cmds.strip().split("\n")
        assert len(lines) == 4
        assert lines[0].startswith("python work.py -B 4 -I 1 ")
        assert lines[0].endswith("|| echo 1 >> failed.lst")
        assert lines[3].endswith("|| echo 4 >> failed.lst")

    def test_retry_round_maps_process_to_failed_id(self, tmp_path):
        desc, cmds, *_ = condor_files(
            ["run", "{I}"], [2, 7], 8, "f.lst", str(tmp_path))
        assert "queue 2" in desc
        lines = cmds.strip().split("\n")
        assert lines[0].startswith("run 2 ")
        assert lines[1].startswith("run 7 ")

    def test_dry_run_prints_description(self, tmp_path, capsys):
        rc = main(["-B", "4", "--submit", "condor", "--dry-run",
                   "--log-dir", str(tmp_path / "logs"),
                   "--failed-list", str(tmp_path / "f.lst"),
                   "--", "echo", "{I}"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "queue 4" in out
        assert "condor_submit" in out and "condor_wait" in out
        assert (tmp_path / "logs" / "condor_cmds.sh").exists()
        assert (tmp_path / "logs" / "exec_line.sh").exists()


class TestCondorSubmitRetry:
    def _fake_condor(self, tmp_path, monkeypatch):
        """Fake condor_submit runs every queued process synchronously
        through the exec_line wrapper (as the real scheduler would,
        just not in parallel); condor_wait is then a no-op."""
        bindir = tmp_path / "bin"
        bindir.mkdir()
        submit = bindir / "condor_submit"
        submit.write_text("""#!/bin/bash
desc="$1"
exe=$(awk -F' = ' '$1=="executable"{print $2}' "$desc")
args=$(awk -F' = ' '$1=="arguments"{print $2}' "$desc")
n=$(awk '$1=="queue"{print $2}' "$desc")
for ((p=0; p<n; p++)); do
  eval "\"$exe\" ${args//\\$(Process)/$p}" || true
done
echo "$n job(s) submitted to cluster 42."
exit 0
""")
        submit.chmod(submit.stat().st_mode | stat.S_IEXEC)
        wait = bindir / "condor_wait"
        wait.write_text("#!/bin/bash\nexit 0\n")
        wait.chmod(wait.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    def test_failed_batch_retried(self, tmp_path, monkeypatch):
        self._fake_condor(tmp_path, monkeypatch)
        marker = tmp_path / "ran"
        state = tmp_path / "round"
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
        rc = main(["-B", "3", "--submit", "condor", "--retries", "1",
                   "--log-dir", str(tmp_path / "logs"),
                   "--failed-list", str(tmp_path / "f.lst"),
                   "--", "bash", str(worker), "{I}"])
        assert rc == 0
        runs = marker.read_text().split()
        # 3 first-round runs + 1 retry of batch 2 (Process 0 -> id 2)
        assert runs == ["1", "2", "3", "2"]
        assert not (tmp_path / "f.lst").exists()

    def test_exhausted_retries_fail(self, tmp_path, monkeypatch):
        self._fake_condor(tmp_path, monkeypatch)
        worker = tmp_path / "work.sh"
        worker.write_text("#!/bin/bash\n[ \"$1\" != 2 ]\n")
        worker.chmod(worker.stat().st_mode | stat.S_IEXEC)
        monkeypatch.chdir(tmp_path)
        rc = main(["-B", "3", "--submit", "condor", "--retries", "1",
                   "--log-dir", str(tmp_path / "logs"),
                   "--failed-list", str(tmp_path / "f.lst"),
                   "--", "bash", str(worker), "{I}"])
        assert rc == 1
        assert (tmp_path / "f.lst").read_text().split() == ["2"]
