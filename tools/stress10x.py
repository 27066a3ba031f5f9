#!/usr/bin/env python3
"""10x scale stress: build a synthetic sf1 by self-unioning the sf0.1
fixture (10 shifted copies; document tokens get a per-copy suffix so
copies stay shingle-disjoint and the dedup family scales like 10x more
data with the SAME duplication profile, not 10x artificial clones),
then bench the worst scale-ladder queries against it.

Usage:
  python3 tools/stress10x.py build           # writes /tmp/sf1
  SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_BENCH_ONLY=a14,j05,t03,t31,t42 \
    SPARK_GRAFT_BENCH_OUT=/tmp/sf1_bench.json sbt "runMain graft.Bench"
  python3 tools/stress10x.py report          # ratios vs BENCH.json

Results recorded in STRESS10X.md.
"""
import json, sys

def build():
    import duckdb
    con = duckdb.connect()
    sf = '/root/testdata/sf0.1'
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    cols = [r[0] for r in con.execute("DESCRIBE lineitem").fetchall()]
    rest = ", ".join(c for c in cols if c != 'l_orderkey')
    con.execute(f"""
      COPY (SELECT l_orderkey + i*10000000 AS l_orderkey, {rest}
            FROM lineitem CROSS JOIN range(10) t(i))
      TO '/tmp/sf1/lineitem.parquet' (FORMAT PARQUET)""")
    # copy 0 keeps its ORIGINAL text (copies 1-9 get the ~i token
    # suffix): the copies stay mutually shingle-disjoint — the dedup-
    # family property — while the phrase/BM25/boolean serve queries
    # (whose vocabulary is real words like 'the'/'customer') still
    # have non-empty postings. A full suffix made the served-index
    # stress vacuous: the query vocabulary matched nothing at sf1.
    con.execute("""
      COPY (SELECT doc_id + i*1000000 AS doc_id,
              CASE WHEN i = 0 THEN text
                ELSE array_to_string(list_transform(string_split(text, ' '),
                  x -> x || '~' || CAST(i AS VARCHAR)), ' ') END AS text,
              lang, source, n_chars
            FROM documents CROSS JOIN range(10) t(i))
      TO '/tmp/sf1/documents.parquet' (FORMAT PARQUET)""")
    # r12 planes: embeddings for the Lloyd-fit/IVF/served-index queries
    # (vec_id shift keeps the 5 query vectors at ids 0-4 in copy 0;
    # identical vectors per copy grow every IVF cell 10x — the fit and
    # probe see 10x corpus volume with the same geometry), and events
    # for the streaming-parity micro-batch pipelines (event_id/user_id
    # shifts grow KEY CARDINALITY 10x, not per-key island sizes, so
    # flatMapGroupsWithState state count scales while per-key work
    # stays constant — the shape a 1000-executor ingest would see).
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    con.execute("""
      COPY (SELECT vec_id + i*1000000 AS vec_id, embedding, label
            FROM embeddings CROSS JOIN range(10) t(i))
      TO '/tmp/sf1/embeddings.parquet' (FORMAT PARQUET)""")
    con.execute("""
      COPY (SELECT event_id + i*10000000 AS event_id, ts,
              user_id + i*1000000 AS user_id, event_type, value, props
            FROM events CROSS JOIN range(10) t(i))
      TO '/tmp/sf1/events.parquet' (FORMAT PARQUET)""")
    print("built /tmp/sf1")

def build100():
    """100x corpus for the SERVE-latency claim: documents + embeddings
    only (the served-index planes), 100 shifted copies of sf0.1 with
    copy 0 verbatim. The point is the gap: in-process phrase/BM25 must
    grow ~100x while the bucket/cell-pruned served paths stay near the
    query-vocabulary's posting volume."""
    import duckdb
    con = duckdb.connect()
    sf = '/root/testdata/sf0.1'
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    con.execute("""
      COPY (SELECT doc_id + i*1000000 AS doc_id,
              CASE WHEN i = 0 THEN text
                ELSE array_to_string(list_transform(string_split(text, ' '),
                  x -> x || '~' || CAST(i AS VARCHAR)), ' ') END AS text,
              lang, source, n_chars
            FROM documents CROSS JOIN range(100) t(i))
      TO '/tmp/sf10/documents.parquet' (FORMAT PARQUET)""")
    con.execute("""
      COPY (SELECT vec_id + i*1000000 AS vec_id, embedding, label
            FROM embeddings CROSS JOIN range(100) t(i))
      TO '/tmp/sf10/embeddings.parquet' (FORMAT PARQUET)""")
    # r19: the round-18 tail's heavy shapes need the events plane
    # (st21 session_window: user_id shift grows KEY CARDINALITY 100x,
    # per-key session work constant — the state-size-vs-key-count
    # axis) and the lineitem plane (e30's full-tuple-ordered windows:
    # l_orderkey shift grows the frame count 100x at constant 7-row
    # window partitions)
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    con.execute("""
      COPY (SELECT event_id + i*10000000 AS event_id, ts,
              user_id + i*1000000 AS user_id, event_type, value, props
            FROM events CROSS JOIN range(100) t(i))
      TO '/tmp/sf10/events.parquet' (FORMAT PARQUET)""")
    cols = [r[0] for r in con.execute("DESCRIBE lineitem").fetchall()]
    rest = ", ".join(c for c in cols if c != 'l_orderkey')
    con.execute(f"""
      COPY (SELECT l_orderkey + i*10000000 AS l_orderkey, {rest}
            FROM lineitem CROSS JOIN range(100) t(i))
      TO '/tmp/sf10/lineitem.parquet' (FORMAT PARQUET)""")
    orders100()
    print("built /tmp/sf10")

def orders100():
    """r20: 100x orders plane, o_orderkey shifted IN STEP with
    lineitem's l_orderkey so the j-spine joins stay 1:1 per copy;
    o_custkey unshifted (customer is a dim — dims don't scale). Feeds
    the s20/s22/s23 maintenance parses and the bucketed-layout stress.
    Standalone subcommand so the (big) document/embedding planes need
    not rebuild."""
    import duckdb
    con = duckdb.connect()
    sf = '/root/testdata/sf0.1'
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    cols = [r[0] for r in con.execute("DESCRIBE orders").fetchall()]
    rest = ", ".join(c for c in cols if c != 'o_orderkey')
    con.execute(f"""
      COPY (SELECT o_orderkey + i*10000000 AS o_orderkey, {rest}
            FROM orders CROSS JOIN range(100) t(i))
      TO '/tmp/sf10/orders.parquet' (FORMAT PARQUET)""")
    print("built /tmp/sf10/orders.parquet")

def report():
    hi = json.load(open('/tmp/sf1_bench.json'))['queries']
    lo = json.load(open('BENCH.json'))['queries']
    for k, v in sorted(hi.items()):
        if k in lo:
            print(f'{k:24s} sf0.1={lo[k]} sf1={v} ratio={v/lo[k]:.1f}')
        else:
            print(f'{k:24s} sf1={v} (no sf0.1 entry in BENCH.json - skipped)')

if __name__ == '__main__':
    import os
    if 'orders100' in sys.argv[1:]:
        os.makedirs('/tmp/sf10', exist_ok=True)
        orders100()
    elif 'build100' in sys.argv[1:]:
        os.makedirs('/tmp/sf10', exist_ok=True)
        build100()
    else:
        os.makedirs('/tmp/sf1', exist_ok=True)
        (build if 'build' in sys.argv[1:] else report)()
