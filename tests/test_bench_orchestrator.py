"""bench.py default-run orchestration (VERDICT.md round-4 next #1/#2):
one watchdogged subprocess per bench, headline-first, explicit error
lines that let the run CONTINUE past a hung bench, roofline forwarded
so only the first child probes, and the stage-2 headline re-emitted as
the final JSON line (the driver parses the last line).

Uses a scripted fake child (no jax, no device) so the mechanics —
timeout kill, nonzero-exit reporting, retry, dedup, budget skip — are
tested in milliseconds.
"""

import importlib
import json
import sys
import time

import pytest

FAKE_CHILD = r"""
import json, os, sys, time
target = os.environ["BENCH_TARGET"]
roof_env = os.environ.get("BENCH_SESSION_ROOFLINE")
def emit(**rec):
    print(json.dumps(rec), flush=True)
if target == "stage2":
    emit(metric="session_gemm_roofline_tflops", value=123.4, unit="TFLOP/s")
    print("stray non-json chatter", flush=True)
    emit(metric="stage2_256px_train_images_per_sec_per_chip", value=750.0,
         unit="images/sec/chip", elapsed_s=0.1)
elif target == "stage1":
    # second child: must inherit the roofline, and its (stale) roofline
    # line must be deduplicated by the parent
    emit(metric="session_gemm_roofline_tflops", value=999.9, unit="TFLOP/s")
    emit(metric="stage1_64px_train_images_per_sec_per_chip", value=640.0,
         unit="images/sec/chip", roof_env=roof_env)
elif target == "v2":
    time.sleep(60)  # simulated hang: parent must kill + continue
elif target == "host":
    sys.exit(3)  # simulated crash: parent must report + continue
else:
    emit(metric=target + "_metric", value=1.0, unit="x")
"""


def _bench():
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    return importlib.import_module("bench")


@pytest.fixture(scope="module")
def orchestrated_lines(tmp_path_factory):
    """One orchestrated run shared by the assertions below (each run
    costs ~30 s: nine fake children plus two deliberate 10 s timeouts
    (generous margins: python startup on this shared 1-core host can take
    seconds under load, and a too-tight timeout flakes the fast children))."""
    import contextlib
    import io

    bench = _bench()
    child = tmp_path_factory.mktemp("bench_orch") / "fake_child.py"
    child.write_text(FAKE_CHILD)
    mp = pytest.MonkeyPatch()
    mp.setattr(bench, "_child_argv", lambda: [sys.executable, str(child)])
    # _T0 is process-import time; reset so the budget window is fresh
    mp.setattr(bench, "_T0", time.monotonic())
    mp.setenv("BENCH_SUB_TIMEOUT", "10")
    mp.setenv("BENCH_BUDGET_S", "300")
    mp.delenv("BENCH_BATCH", raising=False)
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            bench._orchestrate()
    finally:
        mp.undo()
    return [
        json.loads(line) for line in buf.getvalue().splitlines() if line.strip()
    ]


def test_headline_first_and_reemitted_last(orchestrated_lines):
    lines = orchestrated_lines
    metrics = [r["metric"] for r in lines]
    # context line first, then the stage-2 headline
    assert metrics[0] == "session_gemm_roofline_tflops"
    assert metrics[1] == "stage2_256px_train_images_per_sec_per_chip"
    # final line is the re-emitted stage-2 headline for the driver parse
    assert metrics[-1] == "stage2_256px_train_images_per_sec_per_chip"
    assert lines[-1]["reemitted_headline"] is True
    assert lines[-1]["value"] == 750.0


def test_every_line_has_cumulative_elapsed(orchestrated_lines):
    assert all("elapsed_s" in r for r in orchestrated_lines)
    elapsed = [r["elapsed_s"] for r in orchestrated_lines]
    assert elapsed == sorted(elapsed)


def test_hang_times_out_errors_and_run_continues(orchestrated_lines):
    lines = orchestrated_lines
    v2_errors = [r for r in lines if r.get("metric") == "v2" and "error" in r]
    # initial attempt + one headline retry, both killed
    assert len(v2_errors) == 2
    assert all(r["error"] == "timeout" for r in v2_errors)
    assert all(r["watchdog"] == "subprocess_kill" for r in v2_errors)
    # benches AFTER the hung one still ran
    assert any(r.get("metric") == "stage1_golden_metric" for r in lines)
    assert any(r.get("metric") == "e2e_metric" for r in lines)


def test_crash_reported_and_run_continues(orchestrated_lines):
    lines = orchestrated_lines
    host_err = [r for r in lines if r.get("metric") == "host" and "error" in r]
    assert len(host_err) == 1 and host_err[0]["error"] == "child_exit_3"


def test_roofline_forwarded_once(orchestrated_lines):
    lines = orchestrated_lines
    roofs = [r for r in lines if r["metric"] == "session_gemm_roofline_tflops"]
    assert len(roofs) == 1 and roofs[0]["value"] == 123.4
    stage1 = next(
        r for r in lines
        if r["metric"] == "stage1_64px_train_images_per_sec_per_chip"
    )
    # the second child saw the first child's measured roofline via env
    assert stage1["roof_env"] == repr(123.4)


def test_budget_exhaustion_emits_skip_lines(tmp_path, monkeypatch, capfd):
    bench = _bench()
    child = tmp_path / "fake_child.py"
    child.write_text(FAKE_CHILD)
    monkeypatch.setattr(
        bench, "_child_argv", lambda: [sys.executable, str(child)]
    )
    # budget already spent: every bench must emit an explicit skip line
    monkeypatch.setattr(bench, "_T0", time.monotonic() - 1000.0)
    monkeypatch.setenv("BENCH_BUDGET_S", "5")
    monkeypatch.delenv("BENCH_BATCH", raising=False)
    bench._orchestrate()
    lines = [
        json.loads(line)
        for line in capfd.readouterr().out.splitlines()
        if line.strip()
    ]
    skips = [r for r in lines if r.get("error") == "skipped_budget"]
    assert len(skips) == len(bench._DEFAULT_ORDER)
    assert lines[-1]["error"] == "headline_missing"


RETRY_CHILD = r"""
import json, os, sys
target = os.environ["BENCH_TARGET"]
marker = os.environ["RETRY_MARKER"]
if target == "stage2":
    if not os.path.exists(marker):
        open(marker, "w").write("1")
        print(json.dumps({"metric":
            "stage2_256px_train_images_per_sec_per_chip",
            "value": 100.0, "unit": "images/sec/chip"}), flush=True)
        sys.exit(5)  # emit-then-teardown-crash: line already forwarded
    print(json.dumps({"metric":
        "stage2_256px_train_images_per_sec_per_chip",
        "value": 200.0, "unit": "images/sec/chip"}), flush=True)
else:
    print(json.dumps({"metric": target + "_metric", "value": 1.0,
                      "unit": "x"}), flush=True)
"""


def test_retry_metric_lines_carry_attempt_marker(tmp_path, monkeypatch, capfd):
    # a headline child that emits its metric and THEN dies non-zero:
    # the retry's duplicate metric line must be distinguishable
    bench = _bench()
    child = tmp_path / "retry_child.py"
    child.write_text(RETRY_CHILD)
    monkeypatch.setattr(
        bench, "_child_argv", lambda: [sys.executable, str(child)]
    )
    monkeypatch.setattr(bench, "_T0", time.monotonic())
    monkeypatch.setenv("RETRY_MARKER", str(tmp_path / "first_ran"))
    monkeypatch.setenv("BENCH_SUB_TIMEOUT", "10")
    monkeypatch.setenv("BENCH_BUDGET_S", "300")
    monkeypatch.delenv("BENCH_BATCH", raising=False)
    bench._orchestrate()
    lines = [
        json.loads(line)
        for line in capfd.readouterr().out.splitlines()
        if line.strip()
    ]
    stage2 = [
        r for r in lines
        if r.get("metric") == "stage2_256px_train_images_per_sec_per_chip"
        and "error" not in r
    ]
    # first attempt's value, the crash error, retry's value, final re-emit
    assert [r["value"] for r in stage2] == [100.0, 200.0, 200.0]
    assert "attempt" not in stage2[0]
    assert stage2[1]["attempt"] == 2
    assert stage2[2]["reemitted_headline"] is True  # retry's value wins
    assert any(r.get("error") == "child_exit_5" for r in lines)


def test_inprocess_all_run_reemits_headline(monkeypatch, capfd):
    # BENCH_SUBPROC=0 fallback must keep the driver's last-line
    # contract: the stage-2 headline is re-printed at the end
    bench = _bench()
    fakes = {
        t: (lambda t=t: bench._emit(t + "_metric", 1.0, "x"))
        for t, _ in bench._DEFAULT_ORDER
    }
    fakes["stage2"] = lambda: bench._emit(
        "stage2_256px_train_images_per_sec_per_chip", 321.0,
        "images/sec/chip",
    )
    monkeypatch.setattr(bench, "_TARGET_FNS", fakes)
    monkeypatch.setattr(bench, "_session_roofline", lambda: None)
    monkeypatch.setattr(bench, "_LAST_RECORDS", {})
    monkeypatch.setenv("BENCH_TARGET", "all")
    monkeypatch.setenv("BENCH_SUBPROC", "0")
    monkeypatch.delenv("BENCH_BATCH", raising=False)
    bench.main()
    lines = [
        json.loads(line)
        for line in capfd.readouterr().out.splitlines()
        if line.strip()
    ]
    assert lines[-1]["metric"] == "stage2_256px_train_images_per_sec_per_chip"
    assert lines[-1]["reemitted_headline"] is True
    assert lines[-1]["value"] == 321.0
