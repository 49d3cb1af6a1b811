"""attach_healthy_samples: the driver-artifact embedding of gated
healthy-window samples (bench.py).  Pure-python — no SparkSession.

Covers the round-4 case that motivated the full-suite embed: an older
smaller-suite sample (r3 predates q10) wins the shared-subset comparison,
which must not erase the only healthy evidence for the newer queries.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import attach_healthy_samples, compact_line  # noqa: E402


def _write(bench_dir, rnd, queries, extra=None):
    rec = {
        "metric": "bank+pipeline suite wall time",
        "value": round(sum(queries.values()), 3),
        "queries": queries,
        "host_health_score": 140,
        **(extra or {}),
    }
    with open(os.path.join(bench_dir, f"bench_healthy_r{rnd}.json"), "w") as f:
        json.dump(rec, f)
    return rec


def test_small_suite_winner_still_embeds_full_suite_sample(tmp_path):
    bench_dir = str(tmp_path)
    # r3: faster on the shared subset but predates q10
    _write(bench_dir, 3, {"q1": 0.3, "q3": 0.7})
    # r4: slower shared subset (degraded mid-run) but covers q10
    _write(bench_dir, 4, {"q1": 0.6, "q3": 0.9, "q10": 3.9})
    out = {"queries": {"q1": 2.0, "q3": 5.0, "q10": 9.0}}
    attach_healthy_samples(out, bench_dir)
    assert out["healthy_window_round"] == 3
    assert out["healthy_window_sample"]["queries"] == {"q1": 0.3, "q3": 0.7}
    assert out["healthy_window_round_full"] == 4
    assert out["healthy_window_sample_full"]["queries"]["q10"] == 3.9


def test_full_suite_winner_not_duplicated(tmp_path):
    bench_dir = str(tmp_path)
    _write(bench_dir, 3, {"q1": 0.9, "q3": 1.7})
    _write(bench_dir, 4, {"q1": 0.3, "q3": 0.7, "q10": 3.9})
    out = {"queries": {"q1": 2.0, "q3": 5.0, "q10": 9.0}}
    attach_healthy_samples(out, bench_dir)
    # r4 wins the shared subset AND covers the full suite: one embed only
    assert out["healthy_window_round"] == 4
    assert "healthy_window_sample_full" not in out


def test_nested_embeds_and_stale_scaling_keys_stripped(tmp_path):
    bench_dir = str(tmp_path)
    _write(
        bench_dir,
        4,
        {"q1": 0.3},
        extra={
            "healthy_window_sample": {"value": 1.0},
            "healthy_window_round": 3,
            "scaling_efficiency_NtoN4": 0.864,
            "scaling_n_keys": 60000000,
        },
    )
    out = {"queries": {"q1": 2.0}}
    attach_healthy_samples(out, bench_dir)
    emb = out["healthy_window_sample"]
    for k in (
        "healthy_window_sample",
        "healthy_window_round",
        "scaling_efficiency_NtoN4",
        "scaling_n_keys",
    ):
        assert k not in emb


def test_degraded_gated_sample_not_embedded_over_faster_run(tmp_path):
    bench_dir = str(tmp_path)
    _write(bench_dir, 4, {"q1": 5.0, "q3": 6.0})
    out = {"queries": {"q1": 0.5, "q3": 0.6}}
    attach_healthy_samples(out, bench_dir)
    assert "healthy_window_sample" not in out
    assert "healthy_window_sample_full" not in out


def _write_held(bench_dir, queries, score=158, extra=None):
    rec = {
        "value": round(sum(queries.values()), 3),
        "queries": queries,
        "host_health_score": score,
        **(extra or {}),
    }
    with open(os.path.join(bench_dir, "bench_held_r5.json"), "w") as f:
        json.dump(rec, f)
    return rec


def test_held_sample_travels_when_run_window_collapsed(tmp_path):
    """A slower sample whose window HELD (score >= 100 = min(before, after)
    survived the run) must travel alongside the fastest sample — it is the
    only kind of evidence that proves a clean window end-to-end."""
    bench_dir = str(tmp_path)
    _write(bench_dir, 5, {"q1": 1.0, "q3": 1.2},
           extra={"host_health_score": 39})
    _write_held(bench_dir, {"q1": 2.0, "q3": 2.4})
    out = {"queries": {"q1": 3.0, "q3": 3.5}, "host_health_score": 20}
    attach_healthy_samples(out, bench_dir)
    # speed pick unchanged: fastest gated sample wins the healthy embed
    assert out["healthy_window_sample"]["host_health_score"] == 39
    # and the held evidence rides separately
    assert out["held_window_sample"]["host_health_score"] == 158


def test_held_embed_skipped_when_run_itself_held(tmp_path):
    bench_dir = str(tmp_path)
    _write_held(bench_dir, {"q1": 2.0, "q3": 2.4})
    out = {"queries": {"q1": 0.5, "q3": 0.6}, "host_health_score": 120}
    attach_healthy_samples(out, bench_dir)
    assert "held_window_sample" not in out


def test_held_embed_skipped_when_healthy_embed_already_held(tmp_path):
    bench_dir = str(tmp_path)
    _write(bench_dir, 5, {"q1": 1.0, "q3": 1.2})  # health 140: held
    _write_held(bench_dir, {"q1": 2.0, "q3": 2.4})
    out = {"queries": {"q1": 3.0, "q3": 3.5}, "host_health_score": 20}
    attach_healthy_samples(out, bench_dir)
    assert out["healthy_window_sample"]["host_health_score"] == 140
    assert "held_window_sample" not in out


def test_held_embed_respects_config_gate(tmp_path):
    bench_dir = str(tmp_path)
    _write_held(bench_dir, {"q1": 2.0, "q3": 2.4},
                extra={"sf": "0.1", "cpus": 8, "n_keys": 1_000_000})
    out = {"queries": {"q1": 3.0, "q3": 3.5}, "host_health_score": 20,
           "sf": "0.1", "cpus": 32, "n_keys": 10_000_000}
    attach_healthy_samples(out, bench_dir)
    assert "held_window_sample" not in out


def test_gated_sample_from_other_config_not_compared(tmp_path):
    """ADVICE r4: the comparability gate must check cpus and n_keys, not
    just sf — a faster sample taken at a different parallelism or key
    count is not evidence about this configuration."""
    bench_dir = str(tmp_path)
    _write(bench_dir, 5, {"q1": 0.1}, extra={"sf": "0.1", "cpus": 8,
                                             "n_keys": 1_000_000})
    out = {"queries": {"q1": 2.0}, "sf": "0.1", "cpus": 32,
           "n_keys": 10_000_000}
    attach_healthy_samples(out, bench_dir)
    assert "healthy_window_sample" not in out
    # same config → embeds
    _write(bench_dir, 5, {"q1": 0.1}, extra={"sf": "0.1", "cpus": 32,
                                             "n_keys": 10_000_000})
    attach_healthy_samples(out, bench_dir)
    assert out["healthy_window_round"] == 5


# ---------------------------------------------------------------------------
# compact_line: the driver's stdout tail keeps only the last 2,000 chars —
# r4's ~2,045-char verbose line was decapitated and BENCH_r04.json recorded
# parsed:null.  The final line must stay within budget no matter how much
# embedded evidence the full artifact carries.
# ---------------------------------------------------------------------------

def _representative_out(n_queries=13):
    queries = {f"q{i}_some_longish_query_name": round(0.123 + i, 3)
               for i in range(n_queries)}
    sample = {
        "metric": "bank+pipeline suite wall time",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": "0.1",
        "cpus": 32,
        "n_keys": 10_000_000,
        "host_health_score": 141,
        "coherent_sample": True,
        "health_wait_sec": 1800.0,
        "samples": [
            {"total": 99.9, "health_before": 12, "health_after": 14}
            for _ in range(3)
        ],
        "build_xor8_keys_per_sec": 34722222.2,
        "build_fuse8_keys_per_sec": 37593984.9,
        "probe_keys_per_sec": 12987012.9,
        "probe_cogroup_keys_per_sec": 3030303.0,
        "probe_cogroup_wide_keys_per_sec": 4149377.6,
        "xor8_fpp": 0.003894,
        "xor8_bits_per_key": 9.846,
        "fuse8_bits_per_key": 9.04,
        "scaling_efficiency_NtoN4": 0.864,
        "scaling_n_keys": 60_000_000,
    }
    out = dict(sample)
    out["healthy_window_sample_full"] = dict(sample)
    out["healthy_window_round_full"] = 5
    out["healthy_window_sample"] = dict(sample)
    out["healthy_window_round"] = 4
    out["held_window_sample"] = dict(sample)
    out["held_window_round"] = 5
    return out


def test_compact_line_fits_driver_tail_budget():
    line = compact_line(_representative_out(), "BENCH/bench_full_last.json")
    assert len(line) <= 1500
    rec = json.loads(line)
    # driver-graded essentials survive the trim
    for k in ("value", "queries", "host_health_score",
              "scaling_efficiency_NtoN4", "build_xor8_keys_per_sec",
              "probe_keys_per_sec", "xor8_fpp"):
        assert k in rec
    assert len(rec["queries"]) == 13
    # simulating the driver: the line parses from a 2,000-char stdout tail
    tail = ("x" * 5000 + "\n" + line)[-2000:]
    assert json.loads(tail.splitlines()[-1]) == rec


def test_compact_line_prefers_full_coverage_healthy_sample():
    out = _representative_out()
    out["healthy_window_sample_full"]["host_health_score"] = 150
    # budget high enough that trimming doesn't interfere — the padded
    # fixture is larger than the real suite; budget-fit is tested above
    line = compact_line(out, budget=2500)
    rec = json.loads(line)
    assert rec["healthy_round"] == 5
    assert rec["healthy_health"] == 150
    assert rec.get("healthy_total") is not None
    # the distinct shared-subset winner is summarized alongside
    assert rec["healthy_shared_round"] == 4
    assert rec["healthy_shared_health"] == 141
    assert rec["healthy_shared_total"] == out["healthy_window_sample"]["value"]


def test_compact_line_trims_pathological_payload():
    out = _representative_out(n_queries=30)
    line = compact_line(out)
    assert len(line) <= 1500
    rec = json.loads(line)
    assert "value" in rec and "queries" in rec
