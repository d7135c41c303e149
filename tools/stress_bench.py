#!/usr/bin/env python3
"""Aggregate the round-12 stress bench into per-query scaling exponents.

Inputs: three Bench artifacts produced with SPARK_GRAFT_TIME_STAGING=1 over
the same SPARK_GRAFT_ONLY list —
  /tmp/stress_bench_sf0.1.json   (base, n)
  /tmp/stress_bench_x3.json      (3n, StressGen factor 3)
  /tmp/stress_bench_x10.json     (10n, StressGen factor 10)
(each falls back to the committed archive bench/r11_local32/ when the
/tmp copy is gone — the tables regenerate from git alone)

For each query: exponent_full = ln(t10/t1)/ln(10) and exponent_tail =
ln(t10/t3)/ln(10/3). The TAIL exponent is the honest asymptotic readout —
the base point carries the largest constant-overhead share (session,
planning, RocksDB opens), which deflates exponent_full; between 3n and 10n
the constants amortize. A query is flagged when exponent_tail exceeds its
documented model's bound + noise margin:

  linear   (bound 1.00 + 0.35): hash aggregates, equi-joins, banded LSH
           self-joins with constant bucket sizes, the disjoint-copy graph
           family — the stress model grows buckets/components in NUMBER,
           not size, so work is ~n.
  nlogn    (bound 1.10 + 0.35): global/per-key sorts over data-sized
           relations (windows, asof).
  sublinear(bound 1.00 + 0.35): streaming replay queries — dominated by
           fixed per-batch store open/commit costs at replay batch sizes;
           an exponent NEAR 1 here just means the data term is becoming
           visible, which is fine; >1.35 would mean state machinery is
           superlinear in state size, a real bug.

The 0.35 margin is shared-box scheduler noise, measured ±2x on single-shot
runs and ±10-20%% on best-of-2 (BASELINE.md); exponents compound two such
measurements.

Writes bench/bench_r18_stress.json. Not part of the shipped library — dev
tooling, driven once per round.
"""
import json
import math
import os
import sys


def _load(name):
    """Prefer the fresh /tmp artifact; fall back to the committed archive
    so the tables regenerate from git alone. Every hit PRINTS the path it
    was served from — a missing/typo'd fresh artifact silently mixing a
    prior round's archive into this round's table was an ADVICE-flagged
    trap (the round-11 _load fell back two rounds deep with no trace)."""
    for path in (f"/tmp/{name}", f"bench/r18_local32/{name}",
                 f"bench/r17_local32/{name}", f"bench/r16_local32/{name}"):
        if os.path.exists(path):
            print(f"[stress_bench] {name} <- {path}")
            with open(path) as f:
                return json.load(f)
    raise FileNotFoundError(name)

NLOGN = {"q_asof_join", "q_interval_join",
         # round-11 additions: SNM's global key sort; substring-dup's
         # per-document interval-union window sort over dup postings.
         "q_sorted_neighborhood", "q_substring_dup"}
SUBLINEAR = {"q_stream_join", "q_stream_join_outer", "q_stream_tick",
             "q_stream_dedup",
             # round-11 stateful newcomers (RocksDB fixed per-batch cost
             # dominates at replay batch sizes).
             "q_stream_bitmap", "q_stream_quantile", "q_stream_throttle",
             "q_stream_quality",
             # round-12: the change-feed read rides the same 2-batch
             # replay aggregation (store open/commit dominates); the
             # streaming MERGE upsert pays a per-batch COW commit.
             "q_state_changefeed", "q_stream_merge",
             # round-14: the same upsert through MERGE-ON-READ delta
             # commits (O(batch) positional deletes instead of the COW
             # rewrite) - the fix for q_stream_merge's x40 exponent.
             "q_stream_merge_mor",
             # round-14: the table-as-a-stream version walk (per-batch
             # fixed costs dominate at replay sizes, like every stream).
             "q_stream_table_read",
             # round-14: the toTable streaming sink (per-epoch manifest
             # commit is the fixed cost; file bytes are the data term).
             "q_stream_sink_cow",
             # round-15: the bounded-backlog drain (3 fixed AvailableNow
             # micro-batches over the 5-commit backlog; per-batch
             # planning/commit is the fixed cost).
             "q_stream_backlog",
             # round-16: the streaming change feed (two CDF micro-batches
             # per drain; per-batch planning/commit dominates at replay
             # sizes, the change-row bytes are the data term).
             "q_stream_changes",
             # round-16: the native upsert sink (update-mode aggregation
             # state + one eq-entry epoch commit per batch — per-batch
             # fixed costs dominate at replay sizes).
             "q_stream_upsert",
             # round-16: CDC replication (three CDF micro-batches, each
             # a foreachBatch MERGE commit — per-batch plan/commit is
             # the fixed cost, churn bytes the data term).
             "q_cdc_pipeline",
             # round-17: streaming ANN maintenance (three CDF
             # micro-batches through the upsert sink; per-batch
             # plan/state/commit dominates, the per-vector encode is
             # the data term).
             "q_ann_stream",
             # round-17: ANN delete propagation (two CDF micro-batches
             # through foreachBatch retire+append; per-batch plan and
             # keyed-delete commit dominate).
             "q_ann_gc",
             # round-17: incremental MV (three CDF micro-batches, each a
             # per-group delta MERGE commit).
             "q_incremental_mv",
             # round-18: the MV rewrite query runs the same maintenance
             # drain before its (O(groups), rewritten-away) aggregate —
             # per-batch plan/commit dominates like its sibling.
             "q_mv_rewrite"}
# Fixed-geometry LSH (candidate mass ~ n^2 / 2^rows at pinned (bands,
# rows)): EMPTY since round 12 — q_cosine_neardup was deregistered as a
# driver query (it survives as the spec-side control Similarity.
# qCosineNeardup); the production near-dup is the occupancy-compensated
# q_cosine_neardup_scaled below. Kept as a set so re-registering a
# fixed-geometry form slots back into the expected-flag machinery.
LSH_FIXED = set()
# Occupancy-compensated geometry (scaledGeometry): candidate mass is held
# ~linear in n by widening the bucket key with the corpus, so this one is
# gated at the plain linear bound — the shipped fix for LSH_FIXED.
LSH_SCALED = {"q_cosine_neardup_scaled",
              # rides the same occupancy-compensated candidate stage.
              "q_semantic_leakage"}


def model_of(q):
    if q in NLOGN:
        return "nlogn", 1.10 + 0.35
    if q in SUBLINEAR:
        return "streaming-fixed-cost", 1.00 + 0.35
    if q in LSH_FIXED:
        return "lsh-fixed-geometry", 1.00 + 0.35
    if q in LSH_SCALED:
        return "lsh-occupancy-compensated", 1.00 + 0.35
    return "linear", 1.00 + 0.35


def main():
    runs, cpus = {}, set()
    for tag in ["sf0.1", "x3", "x10"]:
        d = _load(f"stress_bench_{tag}.json")
        runs[tag] = d["queries"]
        cpus.add(d.get("cpus"))
    # Exponents compare points across scales — a mixed-core-count sweep
    # (the round-10 local[4]-vs-local[32] incident) produces exponents
    # that measure the LAUNCH COMMAND, not the algorithm. Hard-stop.
    if len(cpus) != 1:
        sys.exit(f"refusing mixed-cpus artifacts: {sorted(map(str, cpus))}")
    # Optional 4th point: a ×40 run over a SUBSET of the heaviest queries
    # (/tmp/stress_bench_x40.json, produced the same way). Its exponent is
    # ln(t40/t10)/ln(4) — one more doubling-and-change of the tail, on the
    # queries where a superlinear term would show first.
    x40 = {}
    try:
        d40 = _load("stress_bench_x40.json")
        if d40.get("cpus") not in cpus:
            sys.exit(f"refusing mixed-cpus x40 artifact: {d40.get('cpus')} "
                     f"vs {sorted(map(str, cpus))}")
        x40 = d40["queries"]
    except FileNotFoundError:
        pass
    names = sorted(set(runs["sf0.1"]) & set(runs["x3"]) & set(runs["x10"]))
    out, flagged = {}, []
    for q in names:
        t1, t3, t10 = runs["sf0.1"][q], runs["x3"][q], runs["x10"][q]
        exp_full = math.log(t10 / t1) / math.log(10)
        exp_tail = math.log(t10 / t3) / math.log(10 / 3)
        model, bound = model_of(q)
        flag = exp_tail > bound
        out[q] = {
            "t_base_s": round(t1, 3), "t_x3_s": round(t3, 3),
            "t_x10_s": round(t10, 3),
            "exp_full": round(exp_full, 3), "exp_tail": round(exp_tail, 3),
            "model": model, "bound": round(bound, 2), "flag": flag,
        }
        if q in x40:
            t40 = x40[q]
            exp40 = math.log(t40 / t10) / math.log(4)
            out[q]["t_x40_s"] = round(t40, 3)
            out[q]["exp_x40"] = round(exp40, 3)
            # The x40 point gates at the same bound as the x10 tail.
            if exp40 > bound:
                out[q]["flag"] = True
                flag = True
        if flag:
            flagged.append(q)
    result = {
        "round": 18,
        "method": ("union-with-perturbation stress fixtures (graft.StressGen: "
                   "consistent TPC-H keys, per-copy user/doc/vec offsets, "
                   "token-suffixed documents and sign-flipped embeddings for "
                   "constant dup density) at 3x and 10x of sf0.1 (+optional "
                   "40x subset); Bench best-of-2 noop-write per scale at "
                   "local[32] (artifacts record cpus; Spark's dynamic scan "
                   "splits totalBytes/cores keep task count ~cores at every "
                   "scale); exponent_tail = ln(t10/t3)/ln(10/3), "
                   "exponent_x40 = ln(t40/t10)/ln(4)"),
        "flagged": flagged,
        # A flag on the fixed-geometry LSH row is the DOCUMENTED design
        # signature (candidate mass ~ n²/2^rows at pinned geometry), kept
        # visible on purpose; the shipped scale path is the
        # occupancy-compensated sibling (q_cosine_neardup_scaled), gated
        # linear in the same table. Only flags OUTSIDE that set indicate
        # an actual scaling regression.
        "flagged_expected": sorted(set(flagged) & LSH_FIXED),
        "flagged_unexpected": sorted(set(flagged) - LSH_FIXED),
        "queries": out,
    }
    # Streaming steady-state: events rows per second at each scale. Wall
    # time ~flat while rows x10 => fixed per-batch cost dominates; the
    # marginal-row cost is the regression-sensitive number.
    base_events = 100_000
    # q_stream_quality replays the DOCUMENTS table (5k rows at sf0.1),
    # not the 100k-event feed — its rows/s must use the right numerator.
    base_rows = {"q_stream_quality": 5_000,
                 # consumes the documents-derived table, not the event feed
                 "q_stream_table_read": 5_000,
                 "q_stream_backlog": 5_000,
                 # replays the embeddings table (5k vectors at sf0.1)
                 "q_ann_stream": 5_000,
                 "q_ann_gc": 5_000,
                 "q_incremental_mv": 5_000,
                 "q_mv_rewrite": 5_000}
    stream_rates = {}
    for q in sorted(SUBLINEAR & set(names)):
        base = base_rows.get(q, base_events)
        t1, t3, t10 = runs["sf0.1"][q], runs["x3"][q], runs["x10"][q]
        stream_rates[q] = {
            "rows_per_s_base": round(base / t1),
            "rows_per_s_x3": round(3 * base / t3),
            "rows_per_s_x10": round(10 * base / t10),
        }
        if q in x40:
            stream_rates[q]["rows_per_s_x40"] = round(40 * base / x40[q])
        out[q]["rows_per_s"] = stream_rates[q]
    result["streaming_rows_per_s"] = stream_rates
    with open("bench/bench_r18_stress.json", "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)

    # Fill the BASELINE.md marker sections.
    hdr = ("| query | t(n) s | t(3n) s | t(10n) s | t(40n) s | exp full | "
           "exp tail | exp ×40 | model |\n|---|---|---|---|---|---|---|---|---|\n")
    rows = "".join(
        f"| `{q}` | {out[q]['t_base_s']:.2f} | {out[q]['t_x3_s']:.2f} | "
        f"{out[q]['t_x10_s']:.2f} | "
        + (f"{out[q]['t_x40_s']:.2f}" if 't_x40_s' in out[q] else "—") + " | "
        f"{out[q]['exp_full']:.2f} | "
        f"{out[q]['exp_tail']:.2f} | "
        + (f"{out[q]['exp_x40']:.2f}" if 'exp_x40' in out[q] else "—")
        + (' **FLAG**' if out[q]['flag'] else '') + " | "
        f"{out[q]['model']} |\n"
        for q in names)
    unexpected = sorted(set(flagged) - LSH_FIXED)
    expected = sorted(set(flagged) & LSH_FIXED)
    stress_md = hdr + rows + (
        f"\n{len(names)} queries measured; "
        f"**{len(unexpected)} unexpected flags** "
        f"({', '.join(unexpected) if unexpected else 'none'})"
        + (f"; {len(expected)} expected-by-design "
           f"({', '.join(expected)} — the fixed-geometry LSH signature; "
           f"its shipped scale path is the occupancy-compensated sibling "
           f"row)" if expected else "")
        + ".\n")
    shdr = ("| query | rows/s @ n | rows/s @ 3n | rows/s @ 10n | rows/s @ 40n |\n"
            "|---|---|---|---|---|\n")
    srows = "".join(
        f"| `{q}` | {v['rows_per_s_base']:,} | {v['rows_per_s_x3']:,} | "
        f"{v['rows_per_s_x10']:,} | "
        + (f"{v['rows_per_s_x40']:,}" if 'rows_per_s_x40' in v else "—")
        + " |\n" for q, v in stream_rates.items())
    # Idempotent refresh: replace BETWEEN begin/end sentinels so a re-sweep
    # (config change, new scale point) regenerates the tables in place
    # instead of silently no-opping on consumed one-shot markers.
    def fill(md, tag, body):
        b, e = f"<!-- {tag}_BEGIN -->", f"<!-- {tag}_END -->"
        i, j = md.index(b) + len(b), md.index(e)
        return md[:i] + "\n" + body + md[j:]

    with open("BASELINE.md") as f:
        md = f.read()
    md = fill(md, "STRESS_RESULTS", stress_md)
    md = fill(md, "STREAM_STEADY_RESULTS", shdr + srows)
    with open("BASELINE.md", "w") as f:
        f.write(md)

    for q in names:
        r = out[q]
        mark = " <-- FLAG" if r["flag"] else ""
        x40s = (f" t40={r['t_x40_s']:7.2f} e40={r['exp_x40']:5.2f}"
                if "t_x40_s" in r else "")
        print(f"{q:26s} {r['t_base_s']:7.2f} {r['t_x3_s']:7.2f} "
              f"{r['t_x10_s']:7.2f}  full={r['exp_full']:5.2f} "
              f"tail={r['exp_tail']:5.2f}{x40s} [{r['model']}]{mark}")
    print(f"\n{len(names)} queries, {len(flagged)} flagged: {flagged}")
    # Exit status gates on UNEXPECTED flags only — the fixed-geometry LSH
    # flag is the documented baseline signature, not a regression.
    return 1 if set(flagged) - LSH_FIXED else 0


if __name__ == "__main__":
    sys.exit(main())
