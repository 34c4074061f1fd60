"""bench.py's driver-facing output contract.

Round-4 lesson (VERDICT r4, "What's wrong #1"): bench.py printed one giant
JSON line with SOAK/OPSOAK/SCALING blobs embedded and the driver's tail
capture truncated it mid-object, so BENCH_r04.json carried parsed=null.
The fix: the final stdout line is a COMPACT headline (no embedded blobs,
bounded size); the fat artifact goes to BENCH_FULL.json.  These tests pin
that contract without running the (minutes-long) bench itself.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench_module():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_full_output() -> dict:
    """A bench result shaped like a worst-case real one: 20 timed queries
    plus fat scaling/soak/opsoak blobs (opsoak padded to 40 operators —
    more than the real bench ever embeds)."""
    return {
        "hw_probe_pages_per_sec_at_16_procs": 6100.0,
        "hw_probe_reference_quiet_vm": 6403.0,
        "metric": "urls_fetched_filtered_per_sec__headline_crawl_plus_queries",
        "value": 70.123,
        "unit": "sec",
        "queries": {f"query_name_{i:02d}": 1.234 for i in range(20)},
        "sf": "sf0.1",
        "num_cpus": 32,
        "urls_per_sec": 6978.12,
        "crawl": {"sec": 32.6, "waves": 8, "inserted": 400000,
                  "fetched": 200000, "failed": 10, "rejected": 5},
        "scaling": {
            "metric": "scaling_efficiency_4_to_16_cpus", "value": 0.835,
            "cpus_lo": 4, "cpus_hi": 16,
            "urls_per_sec_lo": 1788.0, "urls_per_sec_hi": 5972.0,
            "hw_ceiling": 0.904, "value_vs_hw_ceiling": 0.924,
            "probe_before_legs": [6200.0, 6150.0],
            "probe_after_legs": [6100.0, 6050.0],
            "crawl_sec_lo": 160.0, "crawl_sec_hi": 48.0, "sf": "sf0.1",
        },
        "soak": {
            "metric": "soak_1m_pages_crawl", "pages": 1_000_000, "cpus": 32,
            "sec": [181.0, 189.0], "urls_per_sec": [5131.0, 4918.0],
            "inserted": 2_000_000, "fetched": 1_000_000, "waves": 9,
            "ledger_rows": 999_000, "deterministic": True,
        },
        "opsoak": {
            "metric": "operator_input_scaling_soak",
            "sizes": [10_000, 50_000], "size_ratio": 5.0, "cpus": 32,
            "ops": {
                f"operator_{i:02d}": {
                    "10000": {"sec": 1.0, "rows": 10_000},
                    "50000": {"sec": 3.0, "rows": 50_000},
                    "time_ratio": 3.0, "vs_linear": 0.6,
                }
                for i in range(40)
            },
        },
    }


def test_compact_headline_strips_blobs_and_keeps_signal():
    bench = _bench_module()
    compact = bench.compact_headline(_fake_full_output())
    # no fat blobs survive
    assert "scaling" not in compact
    assert "soak" not in compact
    assert "opsoak" not in compact
    # the judge-facing scalars do
    assert compact["value"] == 70.123
    assert compact["urls_per_sec"] == 6978.12
    assert compact["crawl"]["sec"] == 32.6
    assert compact["scaling_efficiency"] == 0.835
    assert compact["hw_ceiling"] == 0.904
    assert compact["value_vs_hw_ceiling"] == 0.924
    assert compact["soak_deterministic"] is True
    assert compact["opsoak_max_vs_linear"] == 0.6
    assert len(compact["queries"]) == 20


def test_compact_headline_is_one_small_json_line():
    bench = _bench_module()
    line = json.dumps(bench.compact_headline(_fake_full_output()))
    assert "\n" not in line
    assert len(line.encode()) < 4096, f"headline line too big: {len(line)}B"
    json.loads(line)  # round-trips


def test_scaling_persistence_prefers_quietest_conditions():
    """SCALING.json keeps the run measured under the quietest verified
    window; a noisier-but-gated rerun must not clobber it, value-blind."""
    bench = _bench_module()

    quiet = {"quiet_legs": True, "probes_chosen": [8012.0, 8788.0, 8126.0, 8542.0],
             "value": 0.70}
    noisy = {"quiet_legs": True, "probes_chosen": [6310.0, 7585.0, 7155.0, 7951.0],
             "value": 0.99}
    assert not bench.scaling_is_canonical(noisy, existing=quiet)
    assert bench.scaling_is_canonical(quiet, existing=noisy)
    # no standing point / non-quiet standing point: any quiet run lands
    assert bench.scaling_is_canonical(noisy, existing=None)
    assert bench.scaling_is_canonical(noisy, existing={"quiet_legs": False})
    # a run that failed its own gate never lands
    assert not bench.scaling_is_canonical({"quiet_legs": False}, existing=None)
    # legacy artifact formats still yield a condition score
    legacy = {"quiet_legs": True,
              "probe_before_legs": [8749.0, 8542.0], "probe_after_legs": [8126.0, 8788.0]}
    assert bench._min_probe(legacy) == 8126.0
    grouped = {"probe_before_legs": {"4": [7000.0], "16": [7500.0]},
               "probe_after_legs": {"4": [6900.0], "16": [7600.0]}}
    assert bench._min_probe(grouped) == 6900.0


def test_compact_headline_without_blobs_is_identityish():
    bench = _bench_module()
    out = _fake_full_output()
    for k in ("scaling", "soak", "opsoak"):
        out.pop(k)
    compact = bench.compact_headline(out)
    assert compact == out
