"""Round-17 measurement probes (guide §1: measure first).

Modes:
  decompose   — split bpe_encode's wall time into learn-loop /
                tokenizer-map-fold / encode-pass components.
  ab          — interleaved A/B of the AQE small-partition knob
                (spark.sql.adaptive.coalescePartitions.parallelismFirst)
                on the anti-scaling queries from PERF_r16's scaling
                block.  parallelismFirst=true (Spark default) keeps
                ~core-count partitions for tiny bounded frames, so
                per-round task waves scale with cores — the r16
                anti-scaler diagnosis; =false lets AQE size partitions
                from data (advisory bytes), the 100 TB-correct rule.
  queries     — time an explicit list of queries (min of N noop runs),
                with tmpdirs.gc_now() between queries like bench.py.

Usage: python tools/probe_r17.py <mode> [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as for bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PROBE_RUNS", "2"))

ANTI_SCALERS = [
    "bpe_encode",
    "triangle_count_scaled",
    "seq_packing_ids",
    "alias_minimize",
    "dedup_components",
    "alias_compact",
    "bug_version_full",
    "profile_table_hll",
    "embedding_pca",
]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(thunk):
    """Times the WHOLE invocation (builder + execution), like
    bench.py — several builders do eager driver-side work
    (collects, localCheckpoints) that must stay inside the clock."""
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "ab"

    from bugzilla_etl_spark import tmpdirs
    from bugzilla_etl_spark.plans import catalog
    from bugzilla_etl_spark.session import get_spark

    catalog.load_all()
    spark = get_spark("probe_r17")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    if mode == "decompose":
        from bugzilla_etl_spark.plans.queries_text import (
            _token_vocab,
            bpe_encode_docs,
            bpe_tokenizer_map,
            bpe_tokenizer_terms,
            fold_term_map,
        )
        from bugzilla_etl_spark.operators import text as T
        from bugzilla_etl_spark.sources import load_table

        out = {}
        for _ in range(N):
            docs = load_table(spark, SF_DIR, "documents")
            spark.sparkContext.setJobDescription("bpe: learn loop")
            t = _timed(lambda: _noop(
                T.bpe_learn(_token_vocab(docs, drop_empty=True), rounds=4)
            ))
            out["learn"] = min(out.get("learn", 9e9), t)
            tmpdirs.gc_now()

            spark.sparkContext.setJobDescription("bpe: term_ids")
            t = _timed(lambda: _noop(bpe_tokenizer_terms(spark, docs)))
            out["term_ids"] = min(out.get("term_ids", 9e9), t)
            tmpdirs.gc_now()

            spark.sparkContext.setJobDescription("bpe: map fold")
            t = _timed(lambda: _noop(bpe_tokenizer_map(spark, docs)))
            out["map_fold"] = min(out.get("map_fold", 9e9), t)
            tmpdirs.gc_now()

            # encode pass alone: pre-materialize the map, then time the
            # corpus pass reading the warm 1-row cache
            tm = bpe_tokenizer_map(spark, docs).persist()
            tm.count()
            spark.sparkContext.setJobDescription("bpe: encode pass only")
            t = _timed(lambda: _noop(bpe_encode_docs(docs, tm)))
            out["encode_only"] = min(out.get("encode_only", 9e9), t)
            tm.unpersist()
            tmpdirs.gc_now()

            spark.sparkContext.setJobDescription("bpe: full query")
            t = _timed(lambda: _noop(
                catalog.QUERIES["bpe_encode"](spark, SF_DIR)
            ))
            out["full"] = min(out.get("full", 9e9), t)
            tmpdirs.gc_now()
        print(json.dumps({k: round(v, 3) for k, v in out.items()}))
        return

    if mode == "ab":
        names = sys.argv[2:] or ANTI_SCALERS
        key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
        res: dict[str, dict[str, float]] = {}
        for name in names:
            fn = catalog.QUERIES[name]
            res[name] = {}
            for arm in ("true", "false", "true", "false"):
                spark.conf.set(key, arm)
                spark.sparkContext.setJobDescription(f"{name} pf={arm}")
                t = _timed(lambda: _noop(fn(spark, SF_DIR)))
                prev = res[name].get(arm, 9e9)
                res[name][arm] = round(min(prev, t), 3)
                tmpdirs.gc_now()
            spark.conf.unset(key)
            print(json.dumps({name: res[name]}), flush=True)
        return

    # mode == "queries"
    names = sys.argv[2:]
    res = {}
    for name in names:
        fn = catalog.QUERIES[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(N):
            spark.sparkContext.setJobDescription(name)
            runs.append(_timed(lambda: _noop(fn(spark, SF_DIR))))
        res[name] = round(min(runs), 3)
        tmpdirs.gc_now()
        print(json.dumps({name: res[name]}), flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
