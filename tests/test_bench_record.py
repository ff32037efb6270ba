"""The round-4 failure mode: one transient axon transport error during
bench warmup returned rc=1 and erased the entire perf record
(BENCH_r04.json). bench.py now retries transient failures (bounded) and
emits the record incrementally; these tests pin that behavior with
injected failing-then-succeeding functions."""

import io
import json
import sys

import pytest

sys.path.insert(0, ".")
import bench  # noqa: E402


class XlaRuntimeError(Exception):
    """Name-matched stand-in for jaxlib's transport-failure class."""


def _flaky(n_failures, exc_factory, result="ok"):
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] <= n_failures:
            raise exc_factory()
        return result

    fn.calls = calls
    return fn


def test_retry_recovers_from_transient_failure():
    fn = _flaky(1, lambda: XlaRuntimeError(
        "remote_compile: read body: response body closed"))
    assert bench._retry(fn, attempts=3, sleep=lambda s: None) == "ok"
    assert fn.calls["n"] == 2


def test_retry_recovers_on_transport_marker_in_plain_error():
    fn = _flaky(2, lambda: RuntimeError("UNAVAILABLE: connection reset"))
    assert bench._retry(fn, attempts=3, sleep=lambda s: None) == "ok"


def test_retry_propagates_non_transient_immediately():
    fn = _flaky(5, lambda: ValueError("shape mismatch"))
    with pytest.raises(ValueError):
        bench._retry(fn, attempts=3, sleep=lambda s: None)
    assert fn.calls["n"] == 1  # no retries burned on a real bug


def test_retry_gives_up_after_bounded_attempts():
    fn = _flaky(10, lambda: XlaRuntimeError("transport"))
    with pytest.raises(XlaRuntimeError):
        bench._retry(fn, attempts=3, sleep=lambda s: None)
    assert fn.calls["n"] == 3


def test_rate_stats_survives_failing_then_succeeding_step():
    """A step fn that flakes once mid-window must still yield a full
    stats record (the retried window is re-timed, not lost)."""
    fn = _flaky(1, lambda: XlaRuntimeError(
        "INTERNAL: stream closed"), result=None)
    stats = bench._rate_stats(fn, audio_s=10.0, iters=2, windows=3)
    assert set(stats) == {"median", "min", "max"}
    assert 0 < stats["min"] <= stats["median"] <= stats["max"]


def test_main_emits_train_headline_before_decode_and_survives_crash(
        monkeypatch, capsys):
    """Incremental emission: the train line is flushed before decode
    runs, so a decode crash cannot erase the headline, and rc stays 0."""
    rec = {"metric": "train_throughput_conformer_rnnt_bias",
           "value": 8400.0, "unit": "audio-seconds/s/chip",
           "spread": [8300.0, 8500.0], "vs_baseline": 1.1}
    monkeypatch.setattr(bench, "bench_train", lambda emit=None: dict(rec))
    monkeypatch.setattr(
        bench, "bench_decode",
        lambda emit=None: (_ for _ in ()).throw(
            XlaRuntimeError("transport died")))
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    rc = bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    first = json.loads(out[0])
    assert first["value"] == 8400.0
    assert first["spread"] == [8300.0, 8500.0]


def test_main_merges_decode_keys_and_spreads(monkeypatch, capsys):
    rec = {"metric": "train_throughput_conformer_rnnt_bias",
           "value": 8400.0, "unit": "audio-seconds/s/chip",
           "spread": [8300.0, 8500.0], "vs_baseline": 1.1}
    monkeypatch.setattr(bench, "bench_train", lambda emit=None: dict(rec))
    monkeypatch.setattr(
        bench, "bench_decode",
        lambda emit=None: ({"ctc_greedy": 9000.0},
                           {"ctc_greedy": [8000.0, 9500.0]}))
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    rc = bench.main()
    lines = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    final = json.loads(lines[-1])
    assert final["decode_ctc_greedy"] == 9000.0
    assert final["decode_ctc_greedy_spread"] == [8000.0, 9500.0]
    assert final["value"] == 8400.0


def test_main_train_crash_still_records_decode(monkeypatch, capsys):
    monkeypatch.setattr(
        bench, "bench_train",
        lambda emit=None: (_ for _ in ()).throw(
            XlaRuntimeError("compile transport flake, exhausted")))
    monkeypatch.setattr(
        bench, "bench_decode",
        lambda emit=None: ({"ctc_greedy": 9000.0},
                           {"ctc_greedy": [8000.0, 9500.0]}))
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    rc = bench.main()
    lines = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    final = json.loads(lines[-1])
    assert final["decode_ctc_greedy"] == 9000.0
    assert final["value"] is None
