"""Hypothesis properties for the round-10 shared kernels: the
_splice_cut word-excision helper (shared by q_dedup_substring_cut and
q_contamination_cut) and the BPE merge-as-string-replace equivalence
(the trick q_tokenizer_fit/apply/vocab all rest on). The splice
property drives Spark on GENERATED data (not the fixtures), so it
covers interval shapes the fixtures never produce: nested, touching,
duplicated, full-cover, out-of-range."""
from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st

WORD = st.text(alphabet="abcx", min_size=1, max_size=4)


@st.composite
def doc_and_intervals(draw):
    words = draw(st.lists(WORD, min_size=1, max_size=12))
    n = len(words)
    ivs = draw(st.lists(
        st.tuples(st.integers(1, n + 2), st.integers(0, 4)),
        max_size=4))
    return words, [(lo, lo + span) for lo, span in ivs]


def _py_cut(words, ivs):
    kept = [w for i, w in enumerate(words, 1)
            if not any(lo <= i <= hi for lo, hi in ivs)]
    cut = [w for i, w in enumerate(words, 1)
           if any(lo <= i <= hi for lo, hi in ivs)]
    return (" ".join(kept), len(kept), len(cut),
            sum(map(len, kept)), sum(map(len, cut)))


@settings(max_examples=8, deadline=None)
@given(st.lists(doc_and_intervals(), min_size=1, max_size=12))
def test_splice_cut_matches_python_reference(spark, docs):
    """_splice_cut on arbitrary (word list, interval set) pairs —
    including nested/touching/duplicate/full-cover/out-of-range
    intervals — equals the obvious Python set-coverage cut."""
    from engine.queries.curation import _splice_cut

    ddf = spark.createDataFrame(
        [(i, words) for i, (words, _) in enumerate(docs)],
        "doc_id long, l array<string>")
    idf = spark.createDataFrame(
        [(i, lo, hi) for i, (_, ivs) in enumerate(docs)
         for lo, hi in ivs],
        "doc_id long, lo long, hi long")
    got = {r["doc_id"]: r for r in _splice_cut(ddf, idf).collect()}
    assert set(got) == set(range(len(docs)))
    for i, (words, ivs) in enumerate(docs):
        clean, nk, nc, ck, cc = _py_cut(words, ivs)
        r = got[i]
        assert (r["text_clean"], r["n_words_kept"], r["n_words_cut"],
                r["n_chars_kept"], r["n_chars_cut"]) == (
            clean, nk, nc, ck, cc), (i, words, ivs)


def _greedy_left_merge(tokens, a, b):
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


TOK = st.sampled_from(["a", "b", "ab", "ba", "aa"])


@settings(max_examples=300, deadline=None)
@given(seq=st.lists(TOK, min_size=1, max_size=10),
       pair=st.tuples(TOK, TOK))
def test_bpe_replace_equals_greedy_left_merge(seq, pair):
    """The double-space encoding trick: applying a merge as ONE plain
    leftmost-non-overlapping string replace on the sentinel-wrapped
    double-space form equals the greedy-left pairwise scanner — for
    ADVERSARIAL token inventories where tokens are prefixes/suffixes
    of each other and of the fused pair ('a','ab','aa','ba','b').
    Python str.replace implements the same leftmost-non-overlap scan
    as Spark's replace() and DuckDB's replace() (pinned cross-engine
    on concrete cases in tests/test_plans_r9.py); this property pins
    the ALGORITHM mapping on the full adversarial space, and
    re-checks DuckDB on every example."""
    a, b = pair
    s = " " + "  ".join(seq) + " "
    spaced = " " + a + "  " + b + " "
    fused = " " + a + b + " "
    merged = s.replace(spaced, fused)
    got = merged.strip().split("  ")
    want = _greedy_left_merge(seq, a, b)
    assert got == want, (seq, pair)
    dd = duckdb.sql(
        "SELECT replace(?, ?, ?) AS m", params=[s, spaced, fused]
    ).fetchone()[0]
    assert dd == merged, (seq, pair)
