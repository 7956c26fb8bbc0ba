"""Bench record contract (round-4 verdict #1).

The driver captures only the LAST 2000 bytes of bench stdout. Round 4's
official run exited 0 and printed a full record, but the line ran 2,055
bytes — so `BENCH_r04.json` landed as `parsed: null` two rounds running.
These tests pin the printed line to the compact contract shape and a
serialized length comfortably under the capture window, on a PADDED
worst-case record (3-digit timings, double-digit shuffle counts,
contaminated-load floats) so drift toward the limit fails here first.
"""

from __future__ import annotations

import json

import bench


def _padded_result() -> dict:
    run = {
        "cpus": 32, "urls_fetched": 400000, "seconds": 1137.25,
        "urls_per_sec": 11073.84,
        "phase_seconds": {k: 100.99 for k in (
            "t_select", "t_fetch", "t_extract", "t_crawled", "t_frontier",
            "t_buckets", "t_metrics")},
        "load_1m_before": 12.29,
        "steal_pct_before": 10.25,
        "steal_pct_during": 48.75,
        "load_1m_after": 33.17,
        "load_gate_passed": False,
        "clean_throughout": False,
    }
    plans = {
        name: {"shuffles": 12, "codegen": 12, "arrow_only": False}
        for name in (*bench.PLAN_GUARD_QUERIES, "crawl_wave")
    }
    return {
        "metric": "urls_crawled_extracted_per_sec",
        "value": 11073.84,
        "unit": "urls/sec",
        "queries": {k: 100.003 for k in bench.HEADLINE},
        "sf": "/root/testdata/sf0.1",
        "headline_total_sec": 1113.103,
        "headline_pass_totals": [122.9, 114.8, 118.1],
        "crawl": dict(run),
        "crawl_median_urls_per_sec": 11032.84,
        "crawl_median_clean_urls_per_sec": 11032.84,
        "fast_scan_bail_pct": 99.875,
        "plans": plans,
        "budget": {"budget_s": 1680.0, "elapsed_s": 1576.3, "k_requested": 3,
                   "samples_run": 14, "samples_skipped_for_budget": 13,
                   "headline_reruns": 4, "headline_passes": 3},
        "scaling": {"low": dict(run), "high": dict(run), "factor": 4.0,
                    "efficiency": 1.016, "efficiency_median": 0.889,
                    "low_clean": False, "high_clean": True,
                    "attempts": [dict(run)] * 12},
        "corpus": "4000x15x500w40000",
    }


def test_printed_line_fits_driver_capture():
    line = json.dumps(bench.compact_record(_padded_result()))
    assert len(line) < 1800, f"printed bench line is {len(line)} bytes"


def test_compact_strips_bulk_and_keeps_contract():
    out = bench.compact_record(_padded_result())
    # bulky diagnostics live in BENCH/history.jsonl only
    assert "headline_pass_totals" not in out
    assert "corpus" not in out
    assert "attempts" not in out["scaling"]
    for leg in (out["crawl"], out["scaling"]["low"], out["scaling"]["high"]):
        assert "phase_seconds" not in leg
        # contamination accounting stays visible per leg: the during-run
        # steal window + the combined before-AND-during verdict (round-5
        # verdict #1); the pre-run probe numbers live in history.jsonl
        assert "steal_pct_during" in leg and "clean_throughout" in leg
        assert "load_1m_before" not in leg  # trimmed for the 1800-byte cap
    # contract fields the judge/driver read
    for key in ("metric", "value", "unit", "queries", "sf",
                "headline_total_sec", "crawl", "plans", "budget", "scaling"):
        assert key in out, key
    s = out["scaling"]
    for key in ("low", "high", "factor", "efficiency", "efficiency_median",
                "low_clean", "high_clean"):
        assert key in s, key


def test_compact_without_scaling_block():
    r = _padded_result()
    del r["scaling"]
    out = bench.compact_record(r)
    assert "scaling" not in out
    assert out["crawl"]["urls_per_sec"] == 11073.84
