"""Phase profile of the OUTER interval-join gates (round 11, VERDICT
item 3): where do events_stream_interval_join_full/outer spend their
19-27 s at sf0.01 — staging writes, micro-batch count, state-store
scheduling — and is the SECOND sentinel tick batch (b2) redundant?

b2 exists to trigger the eviction pass in "the batch after the
watermark advances". Structured Streaming also runs a NO-DATA
micro-batch for exactly that purpose when the watermark moved in the
last data batch (spark.sql.streaming.noDataMicroBatches.enabled,
default true) — if that fires under availableNow, the staged b2 pays
a full extra state schedule (every state partition × both join state
stores) plus a staging write job for nothing.

Modes:
    python scripts/exp_interval_gate.py profile [sf_dir]
        run the full-outer gate as-is; print wall split (staging vs
        drain), per-micro-batch durations and state-operator metrics
        from recentProgress.
    python scripts/exp_interval_gate.py compare [sf_dir]
        run the gate with the standard two tick batches AND with b1
        only (monkeypatched staging); print both row sets' sizes and
        whether they are IDENTICAL (bit-for-bit gate equivalence).
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filesystemagent_spark.session import get_spark  # noqa: E402


def _progress(q) -> list[dict]:
    out = []
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else json.loads(p.json)
        so = d.get("stateOperators", [])
        out.append(
            {
                "batchId": d.get("batchId"),
                "numInputRows": d.get("numInputRows"),
                "durationMs": d.get("durationMs"),
                "state": [
                    {
                        "rowsTotal": s.get("numRowsTotal"),
                        "updated": s.get("numRowsUpdated"),
                        "removed": s.get("numRowsRemoved"),
                        "commitMs": s.get("commitTimeMs"),
                        "shufflePartitions": s.get("numShufflePartitions"),
                        "stateStoreInstances": s.get("numStateStoreInstances"),
                    }
                    for s in so
                ],
            }
        )
    return out


def _run_gate(spark, sf_dir: str, *, ticks: str) -> tuple[list, dict]:
    """Run the full-outer gate; ticks in {'two', 'one'} selects the
    staging recipe. Returns (sorted result rows, profile dict)."""
    import filesystemagent_spark.queries.streaming_gate as G

    orig = G._watermark_tick_batches
    if ticks == "one":
        G._watermark_tick_batches = lambda spark, ev: orig(spark, ev)[:1]
    # capture the drained query object for progress metrics
    orig_drain = G._drain_to_memory
    captured = {}

    def capturing_drain(spark_, df, ckpt, **kw):
        table, q = orig_drain(spark_, df, ckpt, **kw)
        captured["q"] = q
        return table, q

    G._drain_to_memory = capturing_drain
    try:
        t0 = time.time()
        df = G.events_stream_interval_join_full.__wrapped__(spark, sf_dir) \
            if hasattr(G.events_stream_interval_join_full, "__wrapped__") \
            else G.events_stream_interval_join_full(spark, sf_dir)
        rows = sorted(
            (tuple(r) for r in df.collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )
        wall = time.time() - t0
    finally:
        G._watermark_tick_batches = orig
        G._drain_to_memory = orig_drain
    prof = {
        "wall_s": round(wall, 3),
        "n_rows": len(rows),
        "batches": _progress(captured["q"]) if "q" in captured else [],
    }
    return rows, prof


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "profile"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark("exp-interval-gate")
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "profile":
        rows, prof = _run_gate(spark, sf_dir, ticks="two")
        print(json.dumps(prof, indent=1))
        return

    # compare: two ticks (current) vs one tick (+ the engine's no-data
    # batch doing the eviction)
    rows2, prof2 = _run_gate(spark, sf_dir, ticks="two")
    rows1, prof1 = _run_gate(spark, sf_dir, ticks="one")
    print(json.dumps({"two_ticks": prof2, "one_tick": prof1}, indent=1))
    print("IDENTICAL:", rows1 == rows2)
    if rows1 != rows2:
        only2 = [r for r in rows2 if r not in set(map(tuple, rows1))][:5]
        only1 = [r for r in rows1 if r not in set(map(tuple, rows2))][:5]
        print("only in two-ticks:", only2)
        print("only in one-tick:", only1)


if __name__ == "__main__":
    main()
