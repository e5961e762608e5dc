#!/usr/bin/env python3
"""Build the 10x scale-probe dataset from the driver's sf0.1 testdata.

Round-13 scale validation (VERDICT r12 "Next round" #8): the driver box has
no sf1 testdata, so the 10x datapoint is synthesized from sf0.1 along the
axes that actually grow in production:

  /tmp/sf1      -- 10x USERS/ORDERS, same item catalog: orders and lineitem
                   replicated 10x with shifted o_orderkey/o_custkey strides
                   (interactions = lineitem JOIN orders grows 10x, the user
                   dimension grows 10x, partkeys untouched). Every other
                   table copied verbatim. This is the model-family axis.
  /tmp/sf1text  -- 10x DOCUMENTS/EMBEDDINGS over the same vocabulary: copy
                   k=0 is the original; copies k=1..9 are NEW seeded random
                   texts over the same 31-word vocab with the base doc's
                   word count (word j of copy k of doc d =
                   vocab[hash(d*131071 + k*8191 + j) % 31]) so the dup/
                   near-dup structure is not degenerate (replicating text
                   verbatim would plant 10-deep exact-dup groups and blow up
                   every LSH bucket -- a data artifact, not an engine
                   measurement). Embeddings: base + seeded +-0.05 per-dim
                   noise, labels carried so cluster structure survives.
                   lineitem/orders symlink to /tmp/sf1 (10x), the rest are
                   the sf0.1 originals. This is the pipeline-family axis.

Deterministic (duckdb hash(), no RNG state); safe to re-run. Driver-side
python (duckdb) only -- NOT part of the library; the library itself never
synthesizes data.

Usage: python3 tools/gen_scale.py
"""
import duckdb, shutil, glob, os

SRC = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1"
SF1TEXT = "/tmp/sf1text"
KO = 200000   # order-key stride (sf0.1 max o_orderkey < 200000)
KC = 20000    # cust-key stride

def gen_sf1(con):
    os.makedirs(SF1, exist_ok=True)
    ks = ",".join(str(k) for k in range(10))
    con.execute(f"""
    COPY (
      SELECT o_orderkey + k.k*{KO} AS o_orderkey, o_custkey + k.k*{KC} AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{SRC}/orders.parquet'), (SELECT unnest([{ks}]) AS k) k
    ) TO '{SF1}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      SELECT l.* REPLACE (l_orderkey + k.k*{KO} AS l_orderkey)
      FROM read_parquet('{SRC}/lineitem.parquet') l, (SELECT unnest([{ks}]) AS k) k
    ) TO '{SF1}/lineitem.parquet' (FORMAT PARQUET)""")
    for f in glob.glob(f"{SRC}/*.parquet"):
        b = os.path.basename(f)
        if b not in ("orders.parquet", "lineitem.parquet"):
            shutil.copy(f, f"{SF1}/{b}")

def gen_sf1text(con):
    os.makedirs(SF1TEXT, exist_ok=True)
    con.execute(f"""
    CREATE OR REPLACE TEMP TABLE vocab AS
    SELECT row_number() OVER () - 1 AS wid, w FROM (
      SELECT DISTINCT unnest(string_split(text,' ')) AS w
      FROM read_parquet('{SRC}/documents.parquet') ORDER BY w)""")
    con.execute(f"""
    CREATE OR REPLACE TEMP TABLE base AS
    SELECT doc_id, text, lang, source, len(string_split(text,' ')) AS n_words
    FROM read_parquet('{SRC}/documents.parquet')""")
    con.execute(f"""
    COPY (
      SELECT doc_id, text, lang, source, n_chars
      FROM read_parquet('{SRC}/documents.parquet')
      UNION ALL
      SELECT b.doc_id + k.k*5000, t.text, b.lang, b.source, len(t.text)
      FROM base b, (SELECT unnest(range(1,10)) AS k) k,
           LATERAL (
             SELECT string_agg(v.w, ' ' ORDER BY j.j) AS text
             FROM (SELECT unnest(range(b.n_words)) AS j) j
             JOIN vocab v ON v.wid = abs(hash(b.doc_id*131071 + k.k*8191 + j.j)) % 31
           ) t
      ORDER BY doc_id
    ) TO '{SF1TEXT}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      WITH b AS (SELECT * FROM read_parquet('{SRC}/embeddings.parquet'))
      SELECT vec_id, embedding, label FROM b
      UNION ALL
      SELECT b.vec_id + k.k*2000,
             list_transform(
               list_zip(b.embedding, range(1, len(b.embedding)+1)),
               z -> CAST(z[1] + 0.05*(((abs(hash(b.vec_id*524287 + k.k*8191 + CAST(z[2] AS BIGINT)))%2001)/1000.0)-1.0) AS FLOAT)
             ) AS embedding, b.label
      FROM b, (SELECT unnest(range(1,10)) AS k) k
      ORDER BY vec_id
    ) TO '{SF1TEXT}/embeddings.parquet' (FORMAT PARQUET)""")
    for f in glob.glob(f"{SRC}/*.parquet"):
        b = os.path.basename(f)
        if b in ("documents.parquet", "embeddings.parquet",
                 "lineitem.parquet", "orders.parquet"):
            continue
        shutil.copy(f, f"{SF1TEXT}/{b}")
    for b in ("lineitem.parquet", "orders.parquet"):
        dst = f"{SF1TEXT}/{b}"
        if not os.path.exists(dst):
            os.symlink(f"{SF1}/{b}", dst)

if __name__ == "__main__":
    con = duckdb.connect()
    con.execute("SET threads=4")
    gen_sf1(con)
    gen_sf1text(con)
    for t, p in [("orders", SF1), ("lineitem", SF1), ("documents", SF1TEXT),
                 ("embeddings", SF1TEXT)]:
        print(t, con.execute(
            f"select count(*) from read_parquet('{p}/{t}.parquet')").fetchall())
