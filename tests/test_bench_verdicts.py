"""bench.py gauge-verdict helpers (VERDICT r9 #4): the artifact must
say in_band / weather_suspect / above_band itself — pure functions, no
Spark session needed."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_gauge_calm_thresholds():
    calm = {"cpu_spin_sec": 0.24, "scan8_sec": 0.15}
    assert bench.gauge_calm(calm) is True
    # below-min is a faster host, still calm
    assert bench.gauge_calm({"cpu_spin_sec": 0.10, "scan8_sec": 0.05}) is True
    # either gauge above max => contention
    assert bench.gauge_calm({"cpu_spin_sec": 0.24, "scan8_sec": 0.42}) is False
    assert bench.gauge_calm({"cpu_spin_sec": 0.40, "scan8_sec": 0.15}) is False
    # failed gauge => unknown, never a false calm
    assert bench.gauge_calm({"cpu_spin_sec": 0.24, "scan8_sec": None}) is None
    assert bench.gauge_calm(None) is None
    # fresh-session JIT warmup: cold batch hot, warmed batch calm =>
    # the host is calm (contention would inflate BOTH batches)
    assert bench.gauge_calm(
        {"cpu_spin_sec": 0.24, "scan8_sec": 0.45, "scan8_warm_sec": 0.16}
    ) is True
    assert bench.gauge_calm(
        {"cpu_spin_sec": 0.24, "scan8_sec": 0.45, "scan8_warm_sec": 0.44}
    ) is False
    # warm batch missing (old-format dict): fall back to the cold batch
    assert bench.gauge_calm(
        {"cpu_spin_sec": 0.24, "scan8_sec": 0.45, "scan8_warm_sec": None}
    ) is False


def test_family_verdict_reads():
    band = bench.FAMILY_BAND_MAX_SF01["headline"]
    assert bench.family_verdict(band - 0.1, band, [True, True]) == "in_band"
    assert bench.family_verdict(band, band, [False]) == "in_band"  # inclusive
    # over band + any contaminated gauge => weather, not regression
    assert bench.family_verdict(band + 1, band, [False, True]) == "weather_suspect"
    assert bench.family_verdict(band + 1, band, [True, None, False]) == "weather_suspect"
    # over band with every gauge calm => the only code-regression read
    assert bench.family_verdict(band + 1, band, [True, True]) == "above_band"
    # unknown gauges never LAUNDER an over-band run into weather
    assert bench.family_verdict(band + 1, band, [None, None]) == "above_band"
    assert bench.family_verdict(None, band, [True]) == "no_data"


def test_band_table_covers_the_reported_families():
    for key in ("headline", "core50", "full_exec",
                "join_unsalted", "join_aqe_skew_split", "join_salted"):
        assert key in bench.FAMILY_BAND_MAX_SF01
        assert bench.FAMILY_BAND_MAX_SF01[key] > 0
