#!/usr/bin/env python3
"""Composed independent sf1 check for q_corpus_datacard (VERDICT r17 item 4).

The committed datacard oracle embeds EVERY constituent's full replay as a
derived table; at sf1 the minhashDedup constituent's recursive-CTE
transitive closure is intractable in DuckDB (the r11 waiver class), so the
full oracle has never run at that scale. This checker replaces ONLY that
constituent with the linear star+path + union-find replay
(tools/uf_check_minhash.py's semantics over the pinned index artifact) and
runs every OTHER constituent's COMMITTED oracle SQL unchanged, straight
from Verify's oracle_sql.json dump — no re-derived semantics to drift —
then recomputes the per-source rollup and compares it to the engine's
q_corpus_datacard output row-for-row.

Usage: python3 tools/uf_check_datacard.py <sfDir> <verifyOutDir>
Run AFTER graft.Verify has produced <verifyOutDir> for the same sf dir
with q_corpus_datacard in the run (its engine chain pins every artifact
the constituent oracles read — the tools/check.py sequencing rule).
"""
import sys, time, glob, json
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
t0 = time.time()


def tick(msg):
    print(f"{msg} ({time.time() - t0:.0f}s)", flush=True)


con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

# -- near-dup flags: the uf_check_minhash.py replay (label-only) --------
con.execute("CREATE VIEW art AS SELECT doc_id, bands, grams "
            "FROM read_parquet('/tmp/graft_minhash_index/*.parquet')")
con.execute("""CREATE TEMP TABLE banded AS
  SELECT doc_id, i AS band, bands[i + 1] AS key
  FROM art, (SELECT unnest(generate_series(0, 15)) AS i)""")
con.execute("""CREATE TEMP TABLE cand AS
  WITH mins AS (SELECT band, key, min(doc_id) bmin FROM banded GROUP BY 1,2),
  star AS (SELECT m.bmin doc_a, b.doc_id doc_b FROM banded b
           JOIN mins m USING (band,key) WHERE b.doc_id <> m.bmin),
  pathe AS (SELECT prev doc_a, doc_id doc_b FROM (
              SELECT doc_id, lag(doc_id) OVER (
                PARTITION BY band,key ORDER BY doc_id) prev FROM banded)
            WHERE prev IS NOT NULL)
  SELECT DISTINCT doc_a, doc_b
  FROM (SELECT * FROM star UNION ALL SELECT * FROM pathe)""")
verified = con.execute("""
  SELECT c.doc_a, c.doc_b FROM cand c
  JOIN art ga ON c.doc_a = ga.doc_id
  JOIN art gb ON c.doc_b = gb.doc_id
  WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
        / (len(ga.grams) + len(gb.grams)
           - len(list_intersect(ga.grams, gb.grams))) >= 0.5""").fetchall()
tick(f"verified edges: {len(verified)}")

parent = {}


def find(x):
    r = x
    while parent.get(r, r) != r:
        r = parent[r]
    while parent.get(x, x) != x:
        parent[x], x = r, parent[x]
    return r


for a, b in verified:
    ra, rb = find(a), find(b)
    if ra != rb:
        parent[max(ra, rb)] = min(ra, rb)
doc_ids = [r[0] for r in con.execute("SELECT doc_id FROM documents").fetchall()]
con.execute("CREATE TEMP TABLE nd (doc_id BIGINT, near_dup BOOLEAN)")
con.executemany("INSERT INTO nd VALUES (?, ?)",
                [(d, find(d) != d) for d in doc_ids])
tick(f"near-dup labels: {len(doc_ids)} docs, "
     f"{sum(1 for d in doc_ids if find(d) != d)} dups")

# -- every other constituent: its committed oracle SQL, unchanged -------
CONSTITUENTS = [
    ("q_bpe_apply", "bp", "doc_id, n_words, n_bpe_tokens"),
    ("q_unigram_lm_apply", "un", "doc_id, n_unigram_tokens"),
    ("q_text_quality", "tq", "doc_id, quality = 'ok' AS hq"),
    ("q_lm_quality", "lmq", "doc_id, NOT low_quality AS lmk"),
    ("q_model_quality", "clf", "doc_id, keep AS clfk"),
    ("q_unigram_ppl_filter", "ppl", "doc_id, keep AS pplk"),
    ("q_minhash_decontaminate", "ct", "doc_id, TRUE AS contam"),
    ("q_moore_lewis_select", "mls", "doc_id, keep AS mlk"),
    ("q_moore_lewis_budget", "mlb", "doc_id, TRUE AS mlbk"),
]
for name, alias, proj in CONSTITUENTS:
    con.execute(
        f"CREATE TEMP TABLE {alias} AS SELECT {proj} FROM ({oracles[name]}) t")
    tick(f"{alias} <- {name}: "
         f"{con.execute(f'SELECT count(*) FROM {alias}').fetchone()[0]} rows")

# -- the datacard's own contribution: the per-source rollup -------------
expected = con.execute("""
WITH docs AS (SELECT doc_id, source, lang FROM documents),
ex AS (
  SELECT doc_id,
    doc_id > min(doc_id) OVER (PARTITION BY sha256(text)) AS exact_dup
  FROM documents),
joined AS (
  SELECT d.source, d.lang, ex.exact_dup, nd.near_dup,
    bp.n_words, bp.n_bpe_tokens, un.n_unigram_tokens,
    tq.hq, lmq.lmk, clf.clfk, ppl.pplk, ct.contam, mls.mlk, mlb.mlbk
  FROM docs d
  LEFT JOIN ex  USING (doc_id)
  LEFT JOIN nd  USING (doc_id)
  LEFT JOIN bp  USING (doc_id)
  LEFT JOIN un  USING (doc_id)
  LEFT JOIN tq  USING (doc_id)
  LEFT JOIN lmq USING (doc_id)
  LEFT JOIN clf USING (doc_id)
  LEFT JOIN ppl USING (doc_id)
  LEFT JOIN ct  USING (doc_id)
  LEFT JOIN mls USING (doc_id)
  LEFT JOIN mlb USING (doc_id)),
per_source AS (
  SELECT source,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
    CAST(coalesce(sum(n_words), 0) AS BIGINT) AS n_words,
    CAST(coalesce(sum(n_bpe_tokens), 0) AS BIGINT) AS n_bpe_tokens,
    CAST(coalesce(sum(n_unigram_tokens), 0) AS BIGINT) AS n_unigram_tokens,
    CAST(count(*) FILTER (WHERE exact_dup) AS BIGINT) AS n_exact_dups,
    CAST(count(*) FILTER (WHERE near_dup) AS BIGINT) AS n_near_dups,
    CAST(count(*) FILTER (WHERE hq) AS BIGINT) AS n_heuristic_pass,
    CAST(count(*) FILTER (WHERE lmk) AS BIGINT) AS n_lm_pass,
    CAST(count(*) FILTER (WHERE clfk) AS BIGINT) AS n_classifier_pass,
    CAST(count(*) FILTER (WHERE pplk) AS BIGINT) AS n_ppl_pass,
    CAST(count(contam) AS BIGINT) AS n_contaminated,
    CAST(count(mlk) AS BIGINT) AS n_ml_candidates,
    CAST(count(*) FILTER (WHERE mlk) AS BIGINT) AS n_ml_pass,
    CAST(count(*) FILTER (WHERE mlbk) AS BIGINT) AS n_ml_budget_pass
  FROM joined
  GROUP BY source),
lmx AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
  FROM docs GROUP BY 1, 2),
top AS (
  SELECT source, lang AS top_lang, n AS top_lang_docs
  FROM (SELECT *, row_number() OVER (
          PARTITION BY source ORDER BY n DESC, lang) AS rn
        FROM lmx)
  WHERE rn = 1)
SELECT p.source, p.n_docs, p.n_langs, t.top_lang, t.top_lang_docs,
  p.n_words, p.n_bpe_tokens, p.n_unigram_tokens,
  p.n_exact_dups,
  CAST((1000000 * p.n_exact_dups) // p.n_docs AS BIGINT) AS exact_dup_micro,
  p.n_near_dups,
  CAST((1000000 * p.n_near_dups) // p.n_docs AS BIGINT) AS near_dup_micro,
  p.n_heuristic_pass,
  CAST((1000000 * p.n_heuristic_pass) // p.n_docs AS BIGINT) AS heuristic_pass_micro,
  p.n_lm_pass,
  CAST((1000000 * p.n_lm_pass) // p.n_docs AS BIGINT) AS lm_pass_micro,
  p.n_classifier_pass,
  CAST((1000000 * p.n_classifier_pass) // p.n_docs AS BIGINT) AS classifier_pass_micro,
  p.n_ppl_pass,
  CAST((1000000 * p.n_ppl_pass) // p.n_docs AS BIGINT) AS ppl_pass_micro,
  p.n_ml_candidates, p.n_ml_pass,
  CASE WHEN p.n_ml_candidates = 0 THEN CAST(0 AS BIGINT)
       ELSE CAST((1000000 * p.n_ml_pass) // p.n_ml_candidates AS BIGINT)
  END AS ml_keep_micro,
  p.n_ml_budget_pass,
  CASE WHEN p.n_ml_candidates = 0 THEN CAST(0 AS BIGINT)
       ELSE CAST((1000000 * p.n_ml_budget_pass) // p.n_ml_candidates AS BIGINT)
  END AS ml_budget_keep_micro,
  p.n_contaminated
FROM per_source p JOIN top t USING (source)
ORDER BY p.source""").fetchall()

files = glob.glob(f"{out_dir}/q_corpus_datacard/*.parquet")
got = con.execute(
    f"SELECT * FROM read_parquet({files!r}) ORDER BY source").fetchall()
bad = 0
if len(got) != len(expected):
    print(f"ROW COUNT MISMATCH: engine {len(got)} vs composed {len(expected)}")
    bad = abs(len(got) - len(expected))
for g, e in zip(got, expected):
    if tuple(g) != tuple(e):
        bad += 1
        if bad <= 5:
            print("MISMATCH", g, "vs", e)
tick(f"{len(got) - bad}/{len(got)} datacard rows match")
print("PASS" if bad == 0 else "FAIL")
sys.exit(1 if bad else 0)
