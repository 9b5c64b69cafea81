"""Porter stemmer vectors + transform_queries OOV-drop semantics."""

from __future__ import annotations

from partitioned_ef_ans_spark.functions.stemmer import porter_stem

# canonical examples from Porter's 1980 paper / the snowball sample set
VECTORS = {
    "caresses": "caress",
    "ponies": "poni",
    "ties": "ti",
    "caress": "caress",
    "cats": "cat",
    "feed": "feed",
    "agreed": "agre",
    "plastered": "plaster",
    "bled": "bled",
    "motoring": "motor",
    "sing": "sing",
    "conflated": "conflat",
    "troubled": "troubl",
    "sized": "size",
    "hopping": "hop",
    "tanned": "tan",
    "falling": "fall",
    "hissing": "hiss",
    "fizzed": "fizz",
    "failing": "fail",
    "filing": "file",
    "happy": "happi",
    "sky": "sky",
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "valenci": "valenc",
    "hesitanci": "hesit",
    "digitizer": "digit",
    "conformabli": "conform",
    "radicalli": "radic",
    "differentli": "differ",
    "vileli": "vile",
    "analogousli": "analog",
    "vietnamization": "vietnam",
    "predication": "predic",
    "operator": "oper",
    "feudalism": "feudal",
    "decisiveness": "decis",
    "hopefulness": "hope",
    "callousness": "callous",
    "formaliti": "formal",
    "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic",
    "formative": "form",
    "formalize": "formal",
    "electriciti": "electr",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "gyroscopic": "gyroscop",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "homologou": "homolog",
    "communism": "commun",
    "activate": "activ",
    "angulariti": "angular",
    "homologous": "homolog",
    "effective": "effect",
    "bowdlerize": "bowdler",
    "probate": "probat",
    "rate": "rate",
    "cease": "ceas",
    "controll": "control",
    "roll": "roll",
}


def test_porter_vectors():
    bad = {
        w: (porter_stem(w), want)
        for w, want in VECTORS.items()
        if porter_stem(w) != want
    }
    assert not bad, bad


def test_stem_fixture_matches_live_stemmer_over_actual_vocab():
    """The pinned oracle stem table (functions/stem_fixture.py) must
    equal a LIVE porter_stem recomputation over the actual sf0.01
    parquet vocabulary plus every gate query token — a testdata
    regeneration that changed the vocabulary fails here loudly instead
    of silently mis-stemming the DuckDB oracle."""
    import os

    import duckdb

    from partitioned_ef_ans_spark.functions.stem_fixture import STEM_FIXTURE
    from partitioned_ef_ans_spark.gate import GATE_QUERIES
    from partitioned_ef_ans_spark import tokenizer

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")
    con = duckdb.connect()
    vocab = {
        r[0]
        for r in con.execute(
            "SELECT DISTINCT term FROM (SELECT unnest(regexp_split_to_array("
            f"lower(text), '{tokenizer.DUCKDB_TOKEN_SPLIT}')) AS term "
            f"FROM read_parquet('{sf_dir}/documents.parquet')) WHERE term <> ''"
        ).fetchall()
    }
    qterms = {t.lower() for _, terms in GATE_QUERIES for t in terms}
    expect = {t: porter_stem(t) for t in vocab | qterms}
    assert STEM_FIXTURE == expect, {
        "missing": sorted(set(expect) - set(STEM_FIXTURE)),
        "extra": sorted(set(STEM_FIXTURE) - set(expect)),
        "diff": {
            t: (STEM_FIXTURE.get(t), expect.get(t))
            for t in set(expect) & set(STEM_FIXTURE)
            if STEM_FIXTURE[t] != expect[t]
        },
    }


def test_transform_queries_oov_drop(spark):
    from partitioned_ef_ans_spark.operators.transform import transform_queries

    qdf = spark.createDataFrame(
        [
            (0, ["Running", "flies"]),
            (1, ["running", "zzz_unknown"]),  # OOV -> dropped
            (2, ["tables"]),
        ],
        "query_id long, terms array<string>",
    )
    sdict = spark.createDataFrame(
        [("run", 1), ("fli", 2), ("tabl", 3)], "term string, term_id long"
    )
    udict = spark.createDataFrame(
        [("running", 10), ("flies", 20), ("tables", 30)], "term string, term_id long"
    )
    out = {r["query_id"]: (r["term_ids"], r["uterm_ids"])
           for r in transform_queries(qdf, sdict, udict).collect()}
    assert set(out) == {0, 2}
    assert out[0] == ([1, 2], [10, 20])
    assert out[2] == ([3], [30])
