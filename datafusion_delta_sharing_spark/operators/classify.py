"""Multinomial Naive Bayes text classification — train + holdout eval.

The fastText-style corpus classifier shape: LLM data pipelines train
exactly this kind of cheap bag-of-words model to filter 100 TB corpora
(quality filtering a la CCNet / the GPT-3 WebText classifier), so the
engine must express "fit NB on a labeled split, score the rest" as
pure scan-shaped aggregates. Reference parity: the aggregate/join
machinery is the reference's DataFusion-delegated relational surface
(src/lib.rs:16-21); the classifier itself is a standard published
model (McCallum & Nigam 1998, multinomial event model with Laplace
smoothing).

Shape at 100 TB: the corpus is tokenized EXACTLY ONCE — the (id,
token) table and the per-doc label table are materialized
(localCheckpoint) before the shared SQL runs, because the text's CTE
references are INLINED by Catalyst, not reused: the r10-continuation
review measured 9 FileScan + 9 explode nodes in the naive all-CTE
plan. After materialization the remaining passes are: one label
aggregate, one vocabulary (token, class) aggregate, one holdout
scoring equi-join — inverted-index joins, never all-pairs. Class
priors and token totals are one-row scalars (broadcast). The per-doc
score is the only double SUM (the unigram_logprob precedent:
~doc-length ln() terms, cross-engine summation-order drift ~1e-13);
the returned min_margin attests the argmax decisions sit far from
that drift band, and the confusion counts are what the oracle hashes.

Determinism contract: all counts are exact BIGINTs; ln() appears only
in fixed-shape expressions over those integers; EXACT score ties
predict class 0 on both engines (same CASE text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .tfidf import token_rows, token_rows_sql

# The planted concept (the ab_test / logreg_fit precedent — a label the
# data does not carry is planted through a deterministic law BOTH
# engines compute from the same tokens): y = 1 iff the document
# contains ALL {k} = len(_CONCEPT) of {'spark', 'join', 'hash'}. The
# conjunction splits the corpus near 50/50 (measured 229/271 at
# sf0.01) and is NOT expressible by any single unigram, so the unigram
# NB fit is a genuine approximation (holdout accuracy < 1), while each
# planted token's likelihood ratio is large (y = 1 forces its
# presence), keeping every holdout margin orders of magnitude above
# double-sum drift.
_CONCEPT = ("spark", "join", "hash")

# Per-doc labels, from the DOCUMENTS table (not the token table): a
# document with zero tokens — empty or whitespace-only text, exactly
# the junk a quality filter exists to catch — must still get a label
# (y = 0, no concept tokens), a prior contribution, and a holdout
# prediction (prior-only, through the scoring LEFT JOIN below).
# {docs} is an (id) relation over every document; {src} the (id,
# token) relation.
_NB_LABELS_SQL = (
    "SELECT d.{id}, "
    "       CASE WHEN coalesce(t.nc, 0) >= {k} THEN 1 ELSE 0 END AS y, "
    "       d.{id} % 5 AS fold "
    "FROM {docs} d "
    "LEFT JOIN (SELECT {id}, count(DISTINCT CASE WHEN token IN "
    "                       {concept} THEN token END) AS nc "
    "           FROM {src} GROUP BY {id}) t "
    "ON d.{id} = t.{id}")

# ONE SQL text, both engines. {src} is the (id, token) relation,
# {labels} the (id, y, fold) relation — BOTH materialized leaves on
# the Spark side (see module docstring). Folds: id % 5 < 4 trains,
# fold 4 is the holdout. Unknown holdout tokens (absent from the
# training vocabulary) are dropped — the standard multinomial-NB
# choice; a holdout doc with NO known token falls back to the
# prior-only score through the LEFT JOIN's coalesce.
_NB_SQL = (
    "WITH toks AS (SELECT * FROM {src}), "
    "labels AS (SELECT * FROM {labels}), "
    "train_tok AS ("
    "  SELECT t.token, l.y FROM toks t "
    "  JOIN labels l ON t.{id} = l.{id} WHERE l.fold < 4), "
    "vocab AS ("
    "  SELECT token, "
    "         sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS c1, "
    "         sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS c0 "
    "  FROM train_tok GROUP BY token), "
    "scal AS ("
    "  SELECT sum(c1) AS t1, sum(c0) AS t0, count(*) AS v, "
    "         (SELECT sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) "
    "          FROM labels WHERE fold < 4) AS n1, "
    "         (SELECT sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) "
    "          FROM labels WHERE fold < 4) AS n0 "
    "  FROM vocab), "
    "doc_lik AS ("
    "  SELECT t.{id}, count(*) AS n_known, "
    "         sum(ln(v.c1 + 1)) AS l1, sum(ln(v.c0 + 1)) AS l0 "
    "  FROM toks t "
    "  JOIN labels l ON t.{id} = l.{id} "
    "  JOIN vocab v ON t.token = v.token "
    "  WHERE l.fold = 4 GROUP BY t.{id}), "
    "scored AS ("
    "  SELECT l.y, "
    "         (ln(CAST(s.n1 AS DOUBLE)) - ln(CAST(s.n1 + s.n0 "
    "              AS DOUBLE)) "
    "          + coalesce(d.l1 - d.n_known * ln(CAST(s.t1 + s.v "
    "                                               AS DOUBLE)), 0.0)) "
    "         - (ln(CAST(s.n0 AS DOUBLE)) - ln(CAST(s.n1 + s.n0 "
    "                AS DOUBLE)) "
    "            + coalesce(d.l0 - d.n_known * ln(CAST(s.t0 + s.v "
    "                                                 AS DOUBLE)), "
    "                       0.0)) AS diff "
    "  FROM labels l "
    "  LEFT JOIN doc_lik d ON l.{id} = d.{id} "
    "  CROSS JOIN scal s "
    "  WHERE l.fold = 4) "
    "SELECT y AS y_true, "
    "       CASE WHEN diff > 0 THEN 1 ELSE 0 END AS y_pred, "
    "       count(*) AS n_docs, "
    "       round(min(abs(diff)), 4) AS min_margin, "
    "       round(avg(abs(diff)), 4) AS avg_margin "
    "FROM scored GROUP BY y, CASE WHEN diff > 0 THEN 1 ELSE 0 END")


def naive_bayes_eval(spark, docs: DataFrame, text_col: str,
                     id_col: str) -> DataFrame:
    """Fit a Laplace-smoothed multinomial Naive Bayes on the planted
    all-of-{'spark','join','hash'} concept over the ``id % 5 < 4``
    training fold and return the holdout confusion matrix (y_true,
    y_pred, n_docs, min_margin, avg_margin). ``min_margin`` is the
    smallest |log-odds| any counted decision rests on — the in-result
    attestation that no argmax sits inside cross-engine double-sum
    drift. The token table and the label table are localCheckpoint-ed
    so the corpus is scanned/tokenized once, not once per CTE
    reference (module docstring)."""
    toks = token_rows(docs, text_col, id_col).localCheckpoint(eager=False)
    toks.createOrReplaceTempView("_nb_toks")
    docs.select(id_col).createOrReplaceTempView("_nb_docs")
    labels = spark.sql(_NB_LABELS_SQL.format(
        src="_nb_toks", docs="_nb_docs", id=id_col,
        concept=_concept_in(), k=len(_CONCEPT))).localCheckpoint(eager=False)
    labels.createOrReplaceTempView("_nb_labels")
    return spark.sql(_NB_SQL.format(src="_nb_toks", labels="_nb_labels",
                                    id=id_col))


def naive_bayes_eval_sql(source_sql: str, text_col: str,
                         id_col: str) -> str:
    """DuckDB mirror of :func:`naive_bayes_eval` — the IDENTICAL SQL
    texts over the shared tokenizer's (id, token) relation (DuckDB
    materializes repeated CTEs itself; the Spark-side checkpoints are
    a physical-plan concern, not a semantic one)."""
    toks = f"({token_rows_sql(f'({source_sql})', text_col, id_col)})"
    labels = "(" + _NB_LABELS_SQL.format(
        src=toks, docs=f"(SELECT {id_col} FROM ({source_sql}))",
        id=id_col, concept=_concept_in(), k=len(_CONCEPT)) + ")"
    return _NB_SQL.format(src=toks, labels=labels, id=id_col)


def _concept_in() -> str:
    return "(" + ", ".join(f"'{t}'" for t in _CONCEPT) + ")"
