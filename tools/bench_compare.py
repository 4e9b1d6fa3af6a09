#!/usr/bin/env python3
"""Drift-convention bench compare: a bench reading vs the accepted pins.

Usage::

    python tools/bench_compare.py [BENCH_JSON]

``BENCH_JSON`` is any bench output carrying per-query timings —
``BENCH_DETAIL.json`` (the RAW latest full-suite reading, driver-
overwritten each round; the default), ``BENCH_ACCEPTED.json`` (the
builder's accepted quiet reading — the blob the test suite asserts
no-trips on), or a driver ``BENCH_r{N}.json``. Per-query timings are
taken from every top-level key starting with ``queries`` whose value
is a ``{name: sec}`` dict.

Pins come from ``BENCH_PINS.json`` — the authoritative latest-accepted
pin per row. This script exists because the per-round compare was
previously re-implemented ad hoc against the BENCH_BASELINE.md prose,
and the round-14 compare silently used two PRE-r12 pins (the stale
first table entries) and misreported two at-pin rows as 1.2-1.5x band
residents. One pins file + one script = no stale-pin compares.

Output: per-row ratio table (worst first), the >tripwire trips, the
band residents, and the median ratio. Exit code 1 if any row trips
(so the compare can gate automation), 0 otherwise.

Convention reminders (BENCH_BASELINE.md):
- a trip is analyzed, not auto-re-pinned: standalone bracketed
  min-of-3 on a verified-quiet host FIRST (suite-position inflation is
  documented for the editdist/mjpeg class), then the
  old-code-on-today's-host worktree experiment to split regression
  from host-generation drift;
- band residents (1.2-1.5x) keep their pins;
- pins are never lowered on a fast day.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_timings(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    # driver BENCH_r{N}.json wraps the bench stdout line under "parsed"
    # (headline-only "queries" — the per-suite dicts stay in
    # BENCH_DETAIL.json per bench.py's stdout-size cap)
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]
    timings: dict[str, float] = {}
    for key, val in doc.items():
        if key.startswith("queries") and isinstance(val, dict):
            for name, sec in val.items():
                if isinstance(sec, (int, float)):
                    if name in timings:
                        # a row appearing under two suite keys would let
                        # last-wins silently mask a pin mismatch
                        print(f"WARNING: row {name!r} appears in more "
                              f"than one queries* suite in {path}; "
                              f"keeping the last value", file=sys.stderr)
                    timings[name] = float(sec)
    if not timings:
        raise SystemExit(
            f"no per-query timings found in {path} — no 'queries*' dict "
            f"keys. Is this an unparsed driver bench file (raw stdout "
            f"under 'output', like BENCH_r07/r09)? Point this tool at "
            f"BENCH_DETAIL.json / BENCH_ACCEPTED.json or a parsed "
            f"BENCH_r{{N}}.json instead."
        )
    return timings


def main(argv: list[str]) -> int:
    bench_path = argv[1] if len(argv) > 1 else os.path.join(REPO, "BENCH_DETAIL.json")
    pins_doc = json.load(open(os.path.join(REPO, "BENCH_PINS.json")))
    pins = pins_doc["pins"]
    tripwire = float(pins_doc["tripwire"])
    band_low = float(pins_doc["band_low"])

    timings = load_timings(bench_path)
    rows = []
    unpinned = []
    for name, sec in timings.items():
        if name in pins:
            rows.append((sec / pins[name]["pin"], name, sec, pins[name]["pin"]))
        else:
            unpinned.append(name)
    rows.sort(reverse=True)

    trips = [r for r in rows if r[0] > tripwire]
    band = [r for r in rows if band_low <= r[0] <= tripwire]
    print(f"bench: {bench_path}")
    print(f"pinned rows compared: {len(rows)}   median ratio: "
          f"{statistics.median(r[0] for r in rows):.3f}")

    # Suite checkpoints (r15): if the reading carries per-suite q1 +
    # loadavg checkpoints, print them with the out-of-quiet-range ones
    # flagged, so a trip can be attributed to (or cleared of) a
    # contaminated window before any re-pin discussion.
    with open(bench_path) as f:
        raw_doc = json.load(f)
    checkpoints = raw_doc.get("suite_checkpoints")
    if checkpoints:
        _, hi = pins_doc.get("control_q1_quiet", [0.42, 0.48])
        flagged = []
        for tag, cp in checkpoints.items():
            mark = "  <-- LOADED" if cp["q1"] > hi else ""
            if mark:
                flagged.append(tag)
            print(f"  checkpoint {tag}: q1 {cp['q1']:.3f} "
                  f"load {cp['load1']:.2f}/{cp['load5']:.2f}{mark}")
        if flagged:
            print(f"contaminated windows (q1 > {hi}): {flagged} — "
                  f"discount rows in the suites those checkpoints bound")
    if unpinned:
        print(f"UNPINNED rows in bench output (add to BENCH_PINS.json "
              f"when first accepted): {sorted(unpinned)}")
    missing = sorted(set(pins) - set(timings))
    if missing:
        # driver BENCH_r{N}.json carries only the 20 headline rows, so
        # a long absent-list is expected there — summarize it
        if len(missing) > 10:
            print(f"pinned rows absent from this bench output: "
                  f"{len(missing)} (headline-only file; full per-suite "
                  f"rows live in BENCH_DETAIL.json)")
        else:
            print(f"pinned rows absent from this bench output: {missing}")

    print(f"\n>{tripwire}x TRIPS ({len(trips)}) — analyze per the drift "
          f"convention before re-pinning:")
    for ratio, name, sec, pin in trips:
        print(f"  {ratio:5.2f}x  {name}  {sec:.3f} vs pin {pin:.3f}")
    print(f"\n{band_low}-{tripwire}x band ({len(band)}) — keep pins:")
    for ratio, name, sec, pin in band:
        print(f"  {ratio:5.2f}x  {name}  {sec:.3f} vs pin {pin:.3f}")
    print(f"\nfastest 5 vs pin:")
    for ratio, name, sec, pin in rows[-5:]:
        print(f"  {ratio:5.2f}x  {name}  {sec:.3f} vs pin {pin:.3f}")
    return 1 if trips else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
