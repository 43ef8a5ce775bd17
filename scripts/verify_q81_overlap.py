#!/usr/bin/env python3
"""Adversarial re-proof of the q81/q82 oracle's replace()-greedy parity.

The BPE rewrite kernel merges greedily left-to-right, so in `coco` with
the round pair (c, o) BOTH occurrences merge: [co, co]. A space-padded
symbol encoding silently diverges here — consecutive occurrences share
the boundary space, so DuckDB's non-overlapping replace() consumes it
and misses the second: replace(' c o c o ', ' c o ', ' co ') =
' co c o '. The oracle therefore parenthesizes symbols ((c)(o)(c)(o)),
where pair occurrences share no characters and sequential replace IS
the greedy pairing.

This script re-runs the GENERATED q81 oracle (dumped by graft.Verify)
against a corpus built entirely from overlapping-run words (coco,
aaaa, papa, and their extensions — including rounds whose argmax pair
is a MERGED symbol pair like (co, co)) and checks it against the Spark
kernel's dump, row for row. Run:

  sbt -batch 'runMain graft.Verify <corpusDir> <outDir> q81'
  python3 scripts/verify_q81_overlap.py <corpusDir> <outDir>

With no args it materializes the standard adversarial corpus to a temp
dir, expects the caller to have run Verify on it, or exits with the
instructions above.
"""
import json
import sys

import duckdb


def build_corpus(path: str) -> None:
    rows = [
        (0, "coco cococo co coco cococo", "en", "s0", 10),
        (1, "papa papapa pa aaaa aaaaaa", "en", "s0", 10),
        (2, "coco aaaa papa cococo aaaa", "en", "s1", 10),
        (3, "co co pa pa aa aa coco", "en", "s1", 10),
    ]
    values = ",".join(
        f"({i}, '{s}', '{l}', '{src}', {n})" for i, s, l, src, n in rows)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + values + ") v(doc_id, text, lang, source, n_chars)")
    con.execute(f"COPY t TO '{path}/documents.parquet' (FORMAT PARQUET)")


def main() -> None:
    if len(sys.argv) == 2 and sys.argv[1] == "--build":
        import tempfile
        d = tempfile.mkdtemp(prefix="graft_bpe_adv_")
        build_corpus(d)
        print(d)
        return
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    corpus_dir, out_dir = sys.argv[1], sys.argv[2]
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["q81_bpe_merges"]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{corpus_dir}/documents.parquet')")
    oracle = [tuple(map(str, r)) for r in con.execute(sql).fetchall()]
    spark = [tuple(map(str, r)) for r in con.execute(
        "SELECT * FROM read_parquet("
        f"'{out_dir}/q81_bpe_merges/*.parquet') ORDER BY merge_rank"
    ).fetchall()]
    assert oracle == spark, f"DIVERGED:\noracle={oracle}\nspark ={spark}"
    assert any(r[1] == r[2] for r in oracle), \
        "corpus must force a self-pair merge (the overlap class)"
    print(f"OK: {len(oracle)} merge rounds identical, "
          f"incl. self-pair merges {[r[3] for r in oracle if r[1] == r[2]]}")
    # this corpus EXHAUSTS before the configured round count, which
    # also pins the oracle's exhaustion fallback (empty argmax rounds
    # must carry the word table forward via LEFT JOIN + coalesce, not
    # annihilate it through a cross join) on the q82 segmentation path
    try:
        sql82 = json.load(open(f"{out_dir}/oracle_sql.json"))["q82_bpe_encode"]
    except KeyError:
        sql82 = None
    if sql82 is not None:
        import glob
        if glob.glob(f"{out_dir}/q82_bpe_encode/*.parquet"):
            o82 = [tuple(map(str, r)) for r in con.execute(sql82).fetchall()]
            s82 = [tuple(map(str, r)) for r in con.execute(
                "SELECT * FROM read_parquet("
                f"'{out_dir}/q82_bpe_encode/*.parquet') ORDER BY source"
            ).fetchall()]
            assert o82 == s82 and len(o82) > 0, \
                f"q82 DIVERGED:\noracle={o82}\nspark ={s82}"
            print(f"OK: q82 encode rollup identical past exhaustion "
                  f"({len(o82)} source rows)")


if __name__ == "__main__":
    main()
