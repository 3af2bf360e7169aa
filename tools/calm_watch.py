"""Gauge-gated calm watcher (VERDICT r10 #2/#3) — fire a command only
when the host-weather micro-gauges read calm, and bracket it with
opening/closing gauges so the resulting measurement is self-describing.

Rounds 8–10 each lost at least one headline number to noisy-neighbor
host weather: the same sealed tree swung core-50 5.7→11.0 s run-to-run
with zero diff, and three consecutive rounds of `weather_suspect` on a
family makes "no code creep" unfalsifiable. The r10 x80 re-seal proved
the fix — poll the two fixed micro-gauges (`bench.calibrate`: a pure-
Python LCG spin for CPU contention + 8 warmed nation-scan re-counts for
JVM scheduler latency) and only burn the expensive measurement when
BOTH are at-or-below their calm maxima (`bench.CALM_GAUGE_MAX`). This
tool is that pattern made reusable for the FULL bench and any probe.

Usage:
    python tools/calm_watch.py [--max-wait 3600] [--interval 45] \
        [--require-end-calm] -- <command ...>

Behavior: poll until calm (one small gauging SparkSession kept alive
between polls, STOPPED before the command fires so the measured run
owns the host); print one JSON line per poll; on calm, exec the
command; afterwards gauge again (fresh session) and print a
`bracket` line `{open: {...}, close: {...}, rc, sec}`. With
`--require-end-calm`, a stormy CLOSING gauge exits 75 so a wrapper
loop can re-run the whole measurement (the r10 failure mode was a calm
start that went stormy mid-run). Exits 74 when `--max-wait` elapses
without a calm window — distinct codes so callers can tell "never got
a window" from "window closed mid-run" from the command's own failure.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CALM_GAUGE_MAX, calibrate, gauge_calm  # noqa: E402

EXIT_NO_WINDOW = 74
EXIT_END_STORMY = 75


def _gauge(sf_dir: str):
    """One bracketing gauge in a throwaway small session (local[8] —
    the gauge measures host contention, not our own parallelism, and a
    32-thread gauging JVM would itself be weather for the command)."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("calm_watch_gauge")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        return calibrate(spark, sf_dir)
    finally:
        spark.stop()


def main() -> int:
    argv = sys.argv[1:]
    max_wait = 3600.0
    interval = 45.0
    require_end_calm = False
    cmd: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--":
            cmd = argv[i + 1 :]
            break
        if a == "--max-wait":
            max_wait = float(argv[i + 1])
            i += 1
        elif a == "--interval":
            interval = float(argv[i + 1])
            i += 1
        elif a == "--require-end-calm":
            require_end_calm = True
        else:
            print(f"unknown arg {a!r}", file=sys.stderr)
            return 2
        i += 1
    if not cmd:
        print(__doc__, file=sys.stderr)
        return 2

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t0 = time.time()
    opening = None
    while True:
        g = _gauge(sf_dir)
        calm = gauge_calm(g)
        print(
            json.dumps(
                {"watch": "poll", "gauge": g, "calm": calm,
                 "calm_max": CALM_GAUGE_MAX, "waited_sec": round(time.time() - t0, 1)}
            ),
            flush=True,
        )
        if calm:
            opening = g
            break
        if time.time() - t0 + interval > max_wait:
            print(json.dumps({"watch": "gave_up", "waited_sec": round(time.time() - t0, 1)}), flush=True)
            return EXIT_NO_WINDOW
        time.sleep(interval)

    t1 = time.time()
    rc = subprocess.call(cmd)
    sec = round(time.time() - t1, 1)
    closing = _gauge(sf_dir)
    bracket = {
        "watch": "bracket",
        "open": opening,
        "close": closing,
        "close_calm": gauge_calm(closing),
        "rc": rc,
        "sec": sec,
        "cmd": cmd,
    }
    print(json.dumps(bracket), flush=True)
    if rc != 0:
        return rc
    if require_end_calm and gauge_calm(closing) is not True:
        return EXIT_END_STORMY
    return 0


if __name__ == "__main__":
    sys.exit(main())
