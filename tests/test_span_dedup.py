"""remove_duplicate_spans: cut corpus-repeated word k-grams out of every
document. Checked against a from-scratch Python mini-oracle (independent
of both the Spark plan and the DuckDB SQL the driver uses).

The reference has no text surface (pass-through ETL, ETLTask.java:261-283);
this operator belongs to the training-data-pipeline extension family.
"""

from __future__ import annotations

import hashlib

from kafka_etl_consumer_spark.operators.dedup import remove_duplicate_spans

BOILER = "this text is common navigation chrome shared by every page here"


def _py_oracle(texts: dict[int, str], k: int, min_count: int = 2):
    toks = {i: [t for t in s.lower().split() if t] for i, s in texts.items()}
    counts: dict[tuple, int] = {}
    for ts in toks.values():
        for p in range(len(ts) - k + 1):
            g = tuple(ts[p : p + k])
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for i, ts in toks.items():
        covered = set()
        for p in range(len(ts) - k + 1):
            if counts[tuple(ts[p : p + k])] >= min_count:
                covered.update(range(p, p + k))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        out[i] = (
            len(ts),
            len(ts) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


def _run(spark, texts: dict[int, str], k: int = 8):
    df = spark.createDataFrame(
        [(i, s) for i, s in texts.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_fp)
        for r in remove_duplicate_spans(df, k=k).collect()
    }
    assert got == _py_oracle(texts, k)
    return got


def test_cross_doc_boilerplate_removed(spark):
    texts = {
        1: f"alpha beta gamma {BOILER} delta epsilon",
        2: f"{BOILER} totally different unique tail words here now",
        3: "an entirely unique document with no repeated gram at all",
    }
    got = _run(spark, texts, k=8)
    # the 11-token boilerplate is covered in both docs; unique doc untouched
    assert got[1][1] == 11 and got[2][1] == 11 and got[3][1] == 0


def test_within_doc_repetition_counts(spark):
    body = "one two three four five six seven eight"
    texts = {1: f"{body} filler mid tokens {body}", 2: "nothing shared here"}
    got = _run(spark, texts, k=8)
    assert got[1][1] == 16  # both copies of the 8-gram cut
    assert got[2][1] == 0


def test_short_and_empty_docs_survive(spark):
    texts = {1: "under k tokens", 2: "", 3: "   ", 4: "under k tokens"}
    got = _run(spark, texts, k=8)
    # sub-k docs produce no grams: nothing removed, every doc_id present
    assert set(got) == {1, 2, 3, 4}
    assert all(r[1] == 0 for r in got.values())
    assert got[2][0] == 0  # empty doc: zero tokens, md5("") fingerprint
    assert got[2][2] == hashlib.md5(b"").hexdigest()


def test_full_doc_duplicate_fully_removed(spark):
    t = "exact copy of a whole document repeated verbatim twice over"
    got = _run(spark, {1: t, 2: t, 3: "unique bystander"}, k=8)
    assert got[1][1] == got[1][0] and got[2][1] == got[2][0]
    assert got[1][2] == hashlib.md5(b"").hexdigest()
