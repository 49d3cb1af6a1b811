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

from bench import attach_healthy_samples  # noqa: E402


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
