"""PII redaction + repetition quality flags: the pre-tokenizer scrub and
the Gopher/C4-style repetition rule family."""

from __future__ import annotations

from youtube_analytics_lakehouse_databricks_spark.operators.text import redact_pii, repetition_flags


def test_redact_pii_families(spark):
    rows = [
        (1, "contact bob.smith+x@example.co.uk or call (415) 555-0123 today"),
        (2, "server 192.168.1.250 charged card 4111 1111 1111 1111 ssn 123-45-6789"),
        (3, "perfectly clean text with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(df, "doc_id", "text").collect()}

    r1 = out[1]
    assert r1["n_email"] == 1 and r1["n_phone"] == 1
    assert "<EMAIL>" in r1["redacted_text"] and "<PHONE>" in r1["redacted_text"]
    assert "example.co.uk" not in r1["redacted_text"]
    assert "555" not in r1["redacted_text"]

    r2 = out[2]
    assert r2["n_ipv4"] == 1 and r2["n_card"] == 1 and r2["n_ssn"] == 1
    for ph in ("<IPV4>", "<CARD>", "<SSN>"):
        assert ph in r2["redacted_text"], r2["redacted_text"]
    assert r2["pii_total"] >= 3

    r3 = out[3]
    assert r3["pii_total"] == 0 and r3["redacted_text"] == rows[2][1]


def test_repetition_flags(spark):
    clean = "many different words compose this sentence without any repeats occurring here"
    spam = " ".join(["buy"] * 30 + ["now"] * 10)
    loop = "alpha beta alpha beta alpha beta alpha beta alpha beta alpha beta"
    symbols = "$$$ ### @@@ %%% ^^^ &&& *** $$$ ### @@@ %%% ^^^"
    rows = [(1, clean), (2, spam), (3, loop), (4, symbols)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_flags(df, "doc_id", "text").collect()}

    assert out[1]["passes_repetition_rules"]
    assert out[1]["top_token_frac"] < 0.2 and out[1]["dup_bigram_frac"] == 0.0

    # token spam: one token dominates
    assert not out[2]["passes_repetition_rules"]
    assert out[2]["top_token_frac"] == 30 / 40

    # looped bigrams: every adjacent pair repeats
    assert not out[3]["passes_repetition_rules"]
    assert out[3]["dup_bigram_frac"] > 0.8

    # symbol soup
    assert not out[4]["passes_repetition_rules"]
    assert out[4]["symbol_frac"] > 0.5


def test_repetition_flags_no_shuffle(spark):
    """The rule family is per-row array math: no Exchange in the plan."""
    import io
    import re
    from contextlib import redirect_stdout

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    buf = io.StringIO()
    with redirect_stdout(buf):
        repetition_flags(df, "doc_id", "text").explain("formatted")
    assert not re.findall(r"^\(\d+\) Exchange", buf.getvalue(), flags=re.MULTILINE)


def test_repetition_flags_degenerate_docs_fail_explicitly(spark):
    """Zero-token and empty-text docs get passes_repetition_rules = False
    (not NULL): filter('passes_repetition_rules') and its negation
    partition the corpus exactly — degenerate rows never silently vanish
    (round-5 ADVICE fix)."""
    rows = [
        (1, "a perfectly normal sentence with reasonable words here"),
        (2, ""),          # empty text
        (3, "    "),      # whitespace only -> zero tokens, length > 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_flags(df, "doc_id", "text").collect()}
    assert out[1]["passes_repetition_rules"] is True
    for i in (2, 3):
        assert out[i]["passes_repetition_rules"] is False, out[i]
        # metrics are explicit values, not NULLs
        for col in ("top_token_frac", "dup_bigram_frac", "mean_word_len", "symbol_frac"):
            assert out[i][col] is not None, (i, col)
    passed = {r["doc_id"] for r in repetition_flags(df, "doc_id", "text")
              .filter("passes_repetition_rules").collect()}
    failed = {r["doc_id"] for r in repetition_flags(df, "doc_id", "text")
              .filter("NOT passes_repetition_rules").collect()}
    assert passed | failed == {1, 2, 3} and not (passed & failed)
