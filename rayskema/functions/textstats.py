"""Text analysis operators: token counting, quality scoring,
language-ID heuristic, document fingerprinting.

All per-batch ``map_batches`` transforms over zero-copy Arrow batches;
counting/scoring uses ``pyarrow.compute`` regex/string kernels (no
Python row loops).  Fingerprinting: the content-hash variant uses
hashlib (C-speed per row — the hash IS the work); the rolling-hash
variant is fully vectorized over the flat UTF-8 buffer
(``state.sketches.hash_strings``).
"""

from __future__ import annotations


from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..state.sketches import hash_strings

# stopword lists for the language-ID heuristic (tiny, public knowledge)
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "por"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "des", "est", "que", "dans", "pour"),
}


# BPE-style pretokenizer (simplified GPT-2 pattern, RE2-compatible —
# no lookahead): a leading space folds into the following word/number,
# runs of punctuation and residual whitespace are their own tokens
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_stats(ds: "rd.Dataset", text_col: str, id_col: str) -> "rd.Dataset":
    """(id, n_tokens, n_subtokens, n_chars) — whitespace tokens, a
    BPE-ish pretokenizer count (the cheap LLM-token estimate), and the
    UTF-8 char count."""

    def _stats(tab: pa.Table) -> pa.Table:
        return pa.table({
            id_col: tab[id_col],
            "n_tokens": pc.cast(
                pc.count_substring_regex(tab[text_col], pattern=r"\S+"),
                pa.int64()),
            "n_subtokens": pc.cast(
                pc.count_substring_regex(tab[text_col],
                                         pattern=BPE_ISH_PATTERN),
                pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(tab[text_col]), pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        _stats, batch_format="pyarrow")


def quality_stats(ds: "rd.Dataset", text_col: str,
                  id_col: str) -> "rd.Dataset":
    """Quality-scoring raw counts per document — integers only so a SQL
    oracle can reproduce them exactly: (id, n_alpha, n_digit, n_space,
    n_punct, n_words, max_word_len)."""

    def _stats(tab: pa.Table) -> pa.Table:
        t = tab[text_col]
        words = pc.split_pattern_regex(t, pattern=r"\s+")
        word_lens = pc.list_value_length(words)
        # max word length via flatten + segmented max
        flat_lens = pc.utf8_length(pc.list_flatten(words))
        counts = word_lens.fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        fl = flat_lens.to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        mx = np.zeros(len(counts), dtype=np.int64)
        nz = counts > 0
        if nz.any():
            mx[nz] = np.maximum.reduceat(fl, starts[nz])
        # empty split tokens (leading/trailing whitespace) count as words
        # by split semantics; n_words counts non-empty tokens only
        n_words = pc.cast(pc.count_substring_regex(t, pattern=r"\S+"),
                          pa.int64())
        return pa.table({
            id_col: tab[id_col],
            "n_alpha": pc.cast(pc.count_substring_regex(
                t, pattern=r"[A-Za-z]"), pa.int64()),
            "n_digit": pc.cast(pc.count_substring_regex(
                t, pattern=r"[0-9]"), pa.int64()),
            "n_space": pc.cast(pc.count_substring_regex(
                t, pattern=r" "), pa.int64()),
            "n_punct": pc.cast(pc.count_substring_regex(
                t, pattern=r"[.,;:!?]"), pa.int64()),
            "n_words": n_words,
            "max_word_len": pa.array(mx, type=pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        _stats, batch_format="pyarrow")


def repetition_stats(ds: "rd.Dataset", text_col: str,
                     id_col: str) -> "rd.Dataset":
    """Gopher-style repetition quality signals per document:
    ``(id, n_lines, n_dup_lines, dup_line_frac, top_word_frac)``.

    - ``n_dup_lines`` / ``dup_line_frac``: lines (split on ``\\n``)
      minus distinct lines — boilerplate/navigation detection;
    - ``top_word_frac``: the most frequent whitespace token's share of
      all tokens (0.0 for token-less docs) — degenerate-repetition
      detection.

    Fully vectorized: lines/words are flattened list arrays hashed with
    the 64-bit rolling hash (``state.sketches.hash_strings``); distinct
    and mode counts come from one ``np.lexsort`` + run-length pass per
    batch, never a Python loop over rows.  (Collisions in the 64-bit
    hash would undercount distincts; negligible at any batch size.)
    """
    from . import round_half_away

    def _runs(flat_hash: np.ndarray, seg: np.ndarray, n_rows: int):
        """Per-segment (distinct count, max run count, total count)."""
        total = np.bincount(seg, minlength=n_rows)
        if not len(flat_hash):
            z = np.zeros(n_rows, dtype=np.int64)
            return z, z, total
        order = np.lexsort((flat_hash, seg))
        hs, ss = flat_hash[order], seg[order]
        newrun = np.ones(len(hs), dtype=bool)
        newrun[1:] = (ss[1:] != ss[:-1]) | (hs[1:] != hs[:-1])
        run_start = np.flatnonzero(newrun)
        run_counts = np.diff(np.append(run_start, len(hs)))
        run_seg = ss[run_start]
        distinct = np.bincount(run_seg, minlength=n_rows)
        seg_new = np.ones(len(run_start), dtype=bool)
        seg_new[1:] = run_seg[1:] != run_seg[:-1]
        first_runs = np.flatnonzero(seg_new)
        mx = np.zeros(n_rows, dtype=np.int64)
        mx[run_seg[first_runs]] = np.maximum.reduceat(run_counts,
                                                      first_runs)
        return distinct, mx, total

    def _stats(tab: pa.Table) -> pa.Table:
        n = tab.num_rows
        t = pc.fill_null(tab[text_col], "")
        lines = pc.split_pattern(t, pattern="\n")
        lcounts = pc.list_value_length(lines).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lseg = np.repeat(np.arange(n), lcounts)
        lhash = hash_strings(pc.list_flatten(lines).combine_chunks())
        ldistinct, _, ltotal = _runs(lhash, lseg, n)
        dup = ltotal - ldistinct
        # whitespace tokens: split on \s+ yields empty tokens at the
        # edges — mask them out so counts equal the \S+ token set
        words = pc.split_pattern_regex(t, pattern=r"\s+")
        wflat = pc.list_flatten(words).combine_chunks()
        wcounts = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        wseg = np.repeat(np.arange(n), wcounts)
        keep = np.asarray(pc.not_equal(wflat, ""))
        _, wmax, wtotal = _runs(hash_strings(wflat)[keep], wseg[keep], n)
        with np.errstate(invalid="ignore"):
            topf = np.where(wtotal > 0, wmax / np.maximum(wtotal, 1), 0.0)
        return pa.table({
            id_col: tab[id_col],
            "n_lines": pa.array(ltotal, type=pa.int64()),
            "n_dup_lines": pa.array(dup, type=pa.int64()),
            "dup_line_frac": pa.array(
                round_half_away(dup / np.maximum(ltotal, 1)),
                type=pa.float64()),
            "top_word_frac": pa.array(round_half_away(topf),
                                      type=pa.float64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        _stats, batch_format="pyarrow")


def tfidf_top_terms(ds: "rd.Dataset", text_col: str, id_col: str, *,
                    k: int = 3, buckets: int | None = None) -> "rd.Dataset":
    """Per-document top-``k`` TF-IDF terms: ``(id, term, tf, score,
    rank)`` with ``score = tf * ln(N / df)`` (N = corpus rows, df =
    documents containing the term), ranked by (score desc, term asc).
    Terms are lowercased ``[a-z0-9]+`` runs.

    Scale shape: one block-local pass builds distinct (doc, term, tf)
    postings (Arrow hash-agg, no row loops); document frequencies are
    partial-counted per block and summed through ONE hash exchange —
    only the vocabulary moves, never the corpus; the (term → df) table
    is broadcast ONCE via ``ray.put`` and every scoring task does an
    ``index_in`` lookup per batch; the final per-doc top-k is one more
    hash exchange over postings.  The broadcast assumes a
    vocabulary-sized table fits a worker (bound it upstream with a
    min-df filter when the corpus is open-vocabulary at 100 TB).

    Scores are rounded half-away to 6 digits BEFORE ranking so the
    ordering is reproducible across engines (ln differs in the last
    ulp between libms)."""
    from . import round_half_away
    from ..pipelines.relational import (agg_named, bucketed_map_groups,
                                        segment_starts)

    def _postings(tab: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(tab[text_col], "")),
            pattern="[^a-z0-9]+")
        flat = pc.list_flatten(words).combine_chunks()
        counts = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        seg = np.repeat(np.arange(tab.num_rows, dtype=np.int64), counts)
        keep = np.asarray(pc.not_equal(flat, ""))
        ptab = pa.table({"seg": pa.array(seg[keep]),
                         "term": flat.filter(pa.array(keep))})
        g = agg_named(ptab, ["seg", "term"], [([], "count_all")], ["tf"])
        return pa.table({
            id_col: tab[id_col].take(g["seg"]),
            "term": g["term"],
            "tf": pc.cast(g["tf"], pa.int64()),
        })

    # materialize the projected input ONCE: the df pass, the scoring
    # pass and the corpus count below all re-read it, and a
    # nondeterministic upstream (e.g. limit()) re-executed per pass
    # could otherwise emit terms absent from the broadcast df table
    # (same hazard lm_trigram_score guards against)
    proj = ds.select_columns([id_col, text_col]).materialize()
    postings = proj.map_batches(_postings, batch_format="pyarrow")

    # document frequency: postings rows are distinct (doc, term) and a
    # doc lives in one block, so per-block term value_counts are exact
    # df partials; one bucketed exchange sums them
    def _df_partial(tab: pa.Table) -> pa.Table:
        vc = tab["term"].combine_chunks().value_counts()
        return pa.table({"term": vc.field("values"),
                         "df": pc.cast(vc.field("counts"), pa.int64())})

    df_ds = bucketed_map_groups(
        postings.map_batches(_df_partial, batch_format="pyarrow"),
        ["term"],
        lambda t: agg_named(t, ["term"], [("df", "sum")], ["df"]),
        buckets=buckets, sort_within=False)
    dtabs = [t for t in ray.get(df_ds.to_arrow_refs()) if t.num_rows]
    n_docs = proj.count()
    if not dtabs:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=pa.int64()),
            "term": pa.array([], type=pa.string()),
            "tf": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
            "rank": pa.array([], type=pa.int64())}))
    df_tab = pa.concat_tables(dtabs).combine_chunks()
    df_ref = ray.put((df_tab["term"].combine_chunks(),
                      df_tab["df"].combine_chunks()
                      .to_numpy(zero_copy_only=False)))

    def _score(tab: pa.Table) -> pa.Table:
        terms, dfs = ray.get(df_ref)
        idx_arr = pc.index_in(tab["term"].combine_chunks(),
                              value_set=terms)
        if idx_arr.null_count:
            missing = tab["term"].filter(pc.is_null(idx_arr))
            raise RuntimeError(
                "tfidf_top_terms: scoring pass saw terms absent from "
                f"the df table (input not stable across passes?): "
                f"{missing.slice(0, 5).to_pylist()}")
        idx = idx_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        tf = tab["tf"].combine_chunks().to_numpy(zero_copy_only=False)
        score = round_half_away(
            tf * np.log(float(n_docs) / dfs[idx]), 6)
        return tab.append_column("score", pa.array(score))

    scored = postings.map_batches(_score, batch_format="pyarrow")

    def _topk(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([(id_col, "ascending"),
                           ("score", "descending"),
                           ("term", "ascending")])
        new = segment_starts(tab, [id_col])
        firsts = np.flatnonzero(new)
        n = tab.num_rows
        pos = np.arange(n) - np.repeat(
            firsts, np.diff(np.append(firsts, n)))
        keepm = pa.array(pos < k)
        return pa.table({
            id_col: tab[id_col].filter(keepm),
            "term": tab["term"].filter(keepm),
            "tf": tab["tf"].filter(keepm),
            "score": tab["score"].filter(keepm),
            "rank": pa.array((pos[pos < k] + 1).astype(np.int64)),
        })

    return bucketed_map_groups(scored, [id_col], _topk,
                               buckets=buckets, sort_within=False)


def bm25_scores(ds: "rd.Dataset", text_col: str, id_col: str,
                query_terms: list[str], *, k1: float = 1.2,
                b: float = 0.75) -> "rd.Dataset":
    """Okapi BM25 relevance of every document against a FIXED small
    query-term set: ``(id, score_u, n_terms)`` for each document
    matching ≥1 term, where ``score_u = Σ_t round(1e6 · idf(t) ·
    tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)))`` in integer micro-units
    and ``idf(t) = ln((N−df+0.5)/(df+0.5)+1)`` (the Lucene/Okapi-plus
    variant, never negative).  Terms are lowercased ``[a-z0-9]+``
    runs, the same tokenizer as :func:`tfidf_top_terms`.

    Integer micro-unit contributions make the per-document sum
    order-independent and exact (float summation order across terms
    would otherwise vary by engine), so a SQL oracle hash-matches.

    Scale shape: UNLIKE tf-idf there is NO vocabulary exchange — the
    query set is tiny and fixed, so pass 1 is a corpus-stats partial
    (per-block ``N``, ``Σ|d|``, per-query-term df; block-local docs
    make per-block df partials exact) merged on the driver into a
    handful of scalars, and pass 2 scores each block locally against
    those broadcast scalars.  Zero shuffles; two passes over a
    materialized-once projection (the same nondeterministic-upstream
    guard as tf-idf).  At 100 TB both passes stream block-by-block
    and the driver holds ``len(query_terms)+2`` numbers."""
    from . import round_half_away

    terms_arr = pa.array(sorted(set(query_terms)), type=pa.string())
    n_q = len(terms_arr)

    def _tokenize(tab: pa.Table):
        words = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(tab[text_col], "")),
            pattern="[^a-z0-9]+")
        flat = pc.list_flatten(words).combine_chunks()
        counts = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        seg = np.repeat(np.arange(tab.num_rows, dtype=np.int64), counts)
        keep = np.asarray(pc.not_equal(flat, ""))
        return flat.filter(pa.array(keep)), seg[keep]

    proj = ds.select_columns([id_col, text_col]).materialize()

    def _partial(tab: pa.Table) -> pa.Table:
        flat, seg = _tokenize(tab)
        # doc length per row (empty/null docs count 0 tokens but DO
        # count in N, matching SQL's count(*) over the base table)
        dl = np.bincount(seg, minlength=tab.num_rows)
        qidx = pc.index_in(flat, value_set=terms_arr)
        hit = np.asarray(pc.is_valid(qidx))
        qi = qidx.to_numpy(zero_copy_only=False)[hit].astype(np.int64)
        # df partial: distinct docs per term within this block
        pair = np.unique(seg[hit] * n_q + qi) if hit.any() else \
            np.empty(0, dtype=np.int64)
        df = np.bincount(pair % n_q, minlength=n_q) if len(pair) else \
            np.zeros(n_q, dtype=np.int64)
        return pa.table({
            "n_docs": pa.array([tab.num_rows], pa.int64()),
            "sum_dl": pa.array([int(dl.sum())], pa.int64()),
            "df": pa.array([df.tolist()],
                           pa.list_(pa.int64())),
        })

    parts = proj.map_batches(_partial, batch_format="pyarrow").take_all()
    n_docs = sum(r["n_docs"] for r in parts)
    sum_dl = sum(r["sum_dl"] for r in parts)
    df = np.sum([r["df"] for r in parts], axis=0).astype(np.float64) \
        if parts else np.zeros(n_q)
    avgdl = (sum_dl / n_docs) if n_docs else 1.0
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    idf_ref = ray.put(idf)

    def _score(tab: pa.Table) -> pa.Table:
        flat, seg = _tokenize(tab)
        dl = np.bincount(seg, minlength=tab.num_rows).astype(np.float64)
        qidx = pc.index_in(flat, value_set=terms_arr)
        hit = np.asarray(pc.is_valid(qidx))
        qi = qidx.to_numpy(zero_copy_only=False)[hit].astype(np.int64)
        key = seg[hit] * n_q + qi
        tf = np.bincount(key, minlength=tab.num_rows * n_q).astype(
            np.float64).reshape(tab.num_rows, n_q)
        idf_v = ray.get(idf_ref)
        with np.errstate(invalid="ignore", divide="ignore"):
            contrib = (idf_v[None, :] * tf * (k1 + 1.0)
                       / (tf + k1 * (1.0 - b
                                     + b * dl[:, None] / avgdl)))
        cu = round_half_away(np.where(tf > 0, contrib, 0.0) * 1e6, 0) \
            .astype(np.int64)
        score_u = cu.sum(axis=1)
        n_terms = (tf > 0).sum(axis=1).astype(np.int64)
        keep = pa.array(n_terms > 0)
        return pa.table({
            id_col: tab[id_col].filter(keep),
            "score_u": pa.array(score_u[n_terms > 0]),
            "n_terms": pa.array(n_terms[n_terms > 0]),
        })

    return proj.map_batches(_score, batch_format="pyarrow")


def top_k_tokens(ds: "rd.Dataset", text_col: str, *, k: int = 20,
                 buckets: int | None = None) -> "rd.Dataset":
    """Corpus-wide most frequent whitespace tokens: ``(token, n)``,
    top ``k`` by count descending then token ascending (deterministic
    tie-break).

    Scale shape: each block is reduced to its distinct (token, count)
    pairs with Arrow's C-speed ``value_counts`` BEFORE the shuffle
    (partial aggregation), so only the vocabulary — not the corpus —
    moves; the bucketed hash exchange sums partials per token and the
    final sort runs over ~vocabulary rows, not corpus rows."""
    from ..pipelines.relational import agg_named, bucketed_map_groups

    def _partial(tab: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern_regex(
            pc.fill_null(tab[text_col], ""), pattern=r"\s+"))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.combine_chunks().value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    partial = ds.select_columns([text_col]).map_batches(
        _partial, batch_format="pyarrow")

    def _sum(tab: pa.Table) -> pa.Table:
        return agg_named(tab, ["token"], [("n", "sum")], ["n"])

    summed = bucketed_map_groups(partial, ["token"], _sum,
                                 buckets=buckets, sort_within=False)
    return summed.sort(["n", "token"], descending=[True, False]).limit(k)


class LangIdStage:
    """Actor-pool language-ID stage: stopword-marker voting. Patterns
    are compiled once per actor (__init__), scoring is vectorized —
    one count_substring_regex per language over the whole batch."""

    def __init__(self, text_col: str, id_col: str,
                 markers: dict | None = None):
        self.text_col, self.id_col = text_col, id_col
        m = markers or _LANG_MARKERS
        self.langs = sorted(m)
        self.patterns = {
            lang: r"(?i)\b(?:" + "|".join(m[lang]) + r")\b"
            for lang in self.langs
        }

    def __call__(self, tab: pa.Table) -> pa.Table:
        t = tab[self.text_col]
        scores = np.zeros((tab.num_rows, len(self.langs)), dtype=np.int64)
        for i, lang in enumerate(self.langs):
            scores[:, i] = pc.count_substring_regex(
                t, pattern=self.patterns[lang]).to_numpy(
                    zero_copy_only=False)
        best = np.argmax(scores, axis=1)  # ties -> first lang (sorted order)
        pred = np.array(self.langs, dtype=object)[best]
        pred[scores.max(axis=1) == 0] = "und"
        return pa.table({
            self.id_col: tab[self.id_col],
            "pred_lang": pa.array(pred, type=pa.string()),
            "marker_hits": pa.array(scores.max(axis=1), type=pa.int64()),
        })


def regex_extract_columns(
    ds: "rd.Dataset", col: str, pattern: str,
    keep_cols: Sequence[str] = (), *, no_match: str | None = None,
) -> "rd.Dataset":
    """Extract the named groups of ``pattern`` into one string column
    each — ``(keep..., <group1>, <group2>, ...)`` — the log/field
    parsing staple (SQL ``regexp_extract(col, pat, i)`` per group).

    Stateless per-block stage: ONE ``pc.extract_regex`` call per batch
    (RE2, compiled once inside Arrow), struct fields unpacked
    zero-copy; no Python per row, no shuffle.  Rows that do not match
    yield ``no_match`` in every group column — ``None`` (SQL NULL) by
    default; pass ``""`` for DuckDB's ``regexp_extract`` empty-string
    convention.  A NULL input row stays NULL in every group column
    regardless of ``no_match`` (``regexp_extract(NULL, ...)`` is NULL
    in SQL — only a real non-matching string gets the sentinel)."""
    import re as _re
    group_names = list(_re.compile(pattern).groupindex)
    if not group_names:
        raise ValueError("pattern must contain named groups "
                         "(?P<name>...)")
    keep_cols = list(keep_cols)

    def _extract(tab: pa.Table) -> pa.Table:
        src = tab[col].combine_chunks()
        st = pc.extract_regex(src, pattern)
        valid = pc.is_valid(src)
        out = {k: tab[k] for k in keep_cols}
        for g in group_names:
            arr = pc.struct_field(st, g)
            if no_match is not None:
                # fill only true non-matches; null INPUT stays null
                arr = pc.if_else(valid, pc.fill_null(arr, no_match),
                                 pa.nulls(len(src), type=pa.string()))
            out[g] = arr
        return pa.table(out)

    return ds.select_columns(
        list(dict.fromkeys(keep_cols + [col]))).map_batches(
        _extract, batch_format="pyarrow")


def lang_id(ds: "rd.Dataset", text_col: str, id_col: str) -> "rd.Dataset":
    # a picklable INSTANCE runs as stateless tasks on the warm worker
    # pool (patterns are tiny strings; arrow compiles per kernel call)
    # — actor spawn costs seconds on this hardware class and buys
    # nothing for light per-stage state
    stage = LangIdStage(text_col, id_col)
    return ds.select_columns([id_col, text_col]).map_batches(
        stage, batch_format="pyarrow")


# default scrub rules: (name, RE2 pattern, replacement).  Arrow's
# replace_substring_regex and DuckDB's regexp_replace(...'g') are both
# RE2, so a SQL oracle reproduces the redaction byte-for-byte.
SCRUB_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("longnum", r"[0-9]{7,}", "<NUM>"),
)


def scrub_text(ds: "rd.Dataset", text_col: str, id_col: str, *,
               rules: tuple[tuple[str, str, str], ...] = SCRUB_RULES,
               ) -> "rd.Dataset":
    """PII/noise redaction: ``(id, text_clean, n_redactions)`` — every
    match of each rule pattern replaced by its tag, applied in rule
    order.  Vectorized ``pc.replace_substring_regex`` per rule (the
    normalize-stage shape of the reference's ``Normalizer`` hook,
    ``api.go:108-110``, as a standalone corpus-cleaning operator);
    ``n_redactions`` counts matches before replacement so quality
    filters can threshold on redaction density."""

    def _scrub(tab: pa.Table) -> pa.Table:
        t = pc.fill_null(tab[text_col], "")
        total = np.zeros(tab.num_rows, dtype=np.int64)
        for _name, pattern, repl in rules:
            total += pc.count_substring_regex(
                t, pattern=pattern).to_numpy(zero_copy_only=False)
            t = pc.replace_substring_regex(t, pattern=pattern,
                                           replacement=repl)
        return pa.table({
            id_col: tab[id_col],
            "text_clean": t,
            "n_redactions": pa.array(total, type=pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        _scrub, batch_format="pyarrow")


def fingerprint_md5(ds: "rd.Dataset", text_col: str,
                    id_col: str) -> "rd.Dataset":
    """(id, fp) — lowercase-hex MD5 of the UTF-8 text (content hash;
    matches any SQL engine's md5())."""

    def _fp(tab: pa.Table) -> pa.Table:
        from . import md5_hex
        return pa.table({id_col: tab[id_col],
                         "fp": md5_hex(tab[text_col])})

    return ds.select_columns([id_col, text_col]).map_batches(
        _fp, batch_format="pyarrow")


def fingerprint_rolling(ds: "rd.Dataset", text_col: str,
                        id_col: str) -> "rd.Dataset":
    """(id, fp64) — vectorized 64-bit rolling polynomial hash (the cheap
    exact-dup fingerprint for shuffle-free pre-grouping)."""

    def _fp(tab: pa.Table) -> pa.Table:
        h = hash_strings(tab[text_col].combine_chunks())
        return pa.table({id_col: tab[id_col],
                         "fp64": pa.array(h.astype(np.int64))})

    return ds.select_columns([id_col, text_col]).map_batches(
        _fp, batch_format="pyarrow")


def byte_entropy(ds: "rd.Dataset", text_col: str, id_col: str, *,
                 digits: int = 6) -> "rd.Dataset":
    """(id, entropy) — Shannon entropy (nats) of each document's byte
    distribution, a cheap quality/compressibility signal (random or
    highly repetitive text separates from prose).  For ASCII text this
    equals character entropy (the SQL char-split oracle); multibyte
    UTF-8 is scored at byte granularity, same scope note as
    ``charset_jaccard_pairs``.

    Vectorized per batch: one ``np.bincount`` over
    ``row_index * 256 + byte`` (flat UTF-8 buffer, no row loop) gives
    every row's byte histogram at once; entropy is a masked
    ``p*log(p)`` reduction over the (rows, 256) matrix.  Empty
    documents score 0.0; null documents emit no row (SQL UNNEST
    semantics).  Rounded half-away to ``digits`` for cross-engine
    equality."""
    from . import round_half_away

    def _ent(tab: pa.Table) -> pa.Table:
        arr = tab[text_col].combine_chunks()
        mask = arr.is_valid()
        if arr.null_count:
            tab = tab.filter(mask)
            arr = tab[text_col].combine_chunks()
        m = len(arr)
        if m == 0:
            return pa.table({id_col: tab[id_col],
                             "entropy": pa.array([], type=pa.float64())})
        from . import binary_buffers
        offsets, mv, _ = binary_buffers(arr)  # nulls filtered above
        data = np.frombuffer(mv, dtype=np.uint8) if len(mv) \
            else np.empty(0, dtype=np.uint8)
        lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
        row_of_byte = np.repeat(np.arange(m, dtype=np.int64), lens)
        # slice the data buffer to exactly the rows of this batch
        flat = data[offsets[0]:offsets[-1]].astype(np.int64)
        counts = np.bincount(row_of_byte * 256 + flat,
                             minlength=m * 256).reshape(m, 256)
        tot = np.maximum(lens, 1).astype(np.float64)
        p = counts / tot[:, None]
        with np.errstate(divide="ignore", invalid="ignore"):
            term = np.where(counts > 0, p * np.log(p), 0.0)
        ent = -term.sum(axis=1)
        ent[ent == 0.0] = 0.0  # normalize -0.0
        return pa.table({id_col: tab[id_col],
                         "entropy": pa.array(round_half_away(ent, digits))})

    return ds.select_columns([id_col, text_col]).map_batches(
        _ent, batch_format="pyarrow")


def lm_trigram_score(ds: "rd.Dataset", text_col: str, id_col: str, *,
                     digits: int = 6, buckets: int | None = None) -> "rd.Dataset":
    """(id, n_tri, lm_score) — mean log-probability of each document
    under a unigram-of-trigrams model fit on the corpus itself (the
    CCNet-shape LM quality filter, with the corpus as its own model):
    ``lm_score = mean over trigram positions of ln(count(tri)/total)``.
    Unusual byte sequences score low, boilerplate scores high.

    Scale shape (same as :func:`tfidf_top_terms`): block-local trigram
    count partials (trigrams packed to int64 over the flat UTF-8
    buffer — no row loop), ONE bucketed exchange sums the model (only
    the trigram vocabulary moves), the (trigram -> count) table is
    broadcast once via ``ray.put``, and scoring is an ``index_in``
    lookup per batch.  Documents shorter than 3 bytes emit no row
    (they have no trigrams — SQL-join semantics).  Scores are rounded
    half-away for cross-engine equality; byte trigrams equal char
    trigrams for ASCII (same scope note as ``charset_jaccard_pairs``).
    """
    from . import binary_buffers, round_half_away
    from ..pipelines.relational import agg_named, bucketed_map_groups

    def _tris(tab: pa.Table):
        """(row_of_tri, tri_int64) for every trigram position."""
        arr = tab[text_col].combine_chunks()
        offsets, mv, null_mask = binary_buffers(arr)
        m = len(offsets) - 1
        data = np.frombuffer(mv, dtype=np.uint8) if len(mv) \
            else np.empty(0, dtype=np.uint8)
        lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
        if null_mask is not None:
            lens = np.where(null_mask, 0, lens)
        n_tri = np.maximum(lens - 2, 0)
        row = np.repeat(np.arange(m, dtype=np.int64), n_tri)
        # absolute start position of each trigram in the data buffer
        starts = np.repeat(offsets[:-1], n_tri)
        pos = np.arange(len(row), dtype=np.int64) - \
            np.repeat(np.cumsum(n_tri) - n_tri, n_tri)
        p = starts + pos
        # gather uint8 first, upcast the gathered values — avoids an
        # 8x-of-text-bytes int64 copy of the whole flat buffer
        tri = (data[p].astype(np.int64) * 65536
               + data[p + 1].astype(np.int64) * 256
               + data[p + 2].astype(np.int64))
        return row, tri

    def _model_partial(tab: pa.Table) -> pa.Table:
        _, tri = _tris(tab)
        vals, cnts = np.unique(tri, return_counts=True)
        return pa.table({"tri": pa.array(vals),
                         "cnt": pa.array(cnts.astype(np.int64))})

    # materialize the projected input ONCE: both the model pass and the
    # scoring pass replay it, and the model must be built from exactly
    # the blocks that get scored (an upstream limit()/sample could
    # otherwise differ between executions); only the pruned two columns
    # are held
    ds = ds.select_columns([id_col, text_col]).materialize()
    model_ds = bucketed_map_groups(
        ds.select_columns([text_col]).map_batches(
            _model_partial, batch_format="pyarrow"),
        ["tri"],
        lambda t: agg_named(t, ["tri"], [("cnt", "sum")], ["cnt"]),
        buckets=buckets, sort_within=False)
    mtabs = [t for t in ray.get(model_ds.to_arrow_refs()) if t.num_rows]
    if not mtabs:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=pa.int64()),
            "n_tri": pa.array([], type=pa.int64()),
            "lm_score": pa.array([], type=pa.float64())}))
    model = pa.concat_tables(mtabs).combine_chunks()
    tri_vals = model["tri"].combine_chunks().to_numpy(
        zero_copy_only=False)
    tri_cnts = model["cnt"].combine_chunks().to_numpy(
        zero_copy_only=False).astype(np.float64)
    order = np.argsort(tri_vals)
    total = float(tri_cnts.sum())
    model_ref = ray.put((tri_vals[order], tri_cnts[order], total))

    def _score(tab: pa.Table) -> pa.Table:
        vals, cnts, tot = ray.get(model_ref)
        row, tri = _tris(tab)
        idx = np.searchsorted(vals, tri)
        # belt-and-braces: every trigram is in the model by
        # construction (same materialized blocks built it); if one
        # ever is not, floor it at count 1 instead of indexing out of
        # range or reading a neighbor's count
        idx = np.minimum(idx, len(vals) - 1)
        cnt = np.where(vals[idx] == tri, cnts[idx], 1.0)
        lp = np.log(cnt / tot)
        n = tab.num_rows
        n_tri = np.bincount(row, minlength=n).astype(np.int64)
        sums = np.zeros(n, dtype=np.float64)
        np.add.at(sums, row, lp)
        keep = n_tri > 0
        score = round_half_away(sums[keep] / n_tri[keep], digits)
        return pa.table({
            id_col: tab[id_col].filter(pa.array(keep)),
            "n_tri": pa.array(n_tri[keep]),
            "lm_score": pa.array(score)})

    return ds.map_batches(_score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Linear quality classifier (the fastText-classifier stage shape)
# ---------------------------------------------------------------------------

QUALITY_FEATURES = ("n_chars", "n_alpha", "n_digit", "n_space",
                    "n_punct", "n_words", "max_word_len")


class LinearQualityScorer:
    """Broadcast-model scoring stage: an integer linear classifier over
    deterministic text features (the distributed shape of a fastText /
    logistic quality filter — swap the feature fn and weight vector
    for a real model; the Ray plumbing is identical).

    The weight vector rides the object store (``ray.put`` once on the
    driver; each WORKER resolves the ref once on first batch and
    caches it — the instance pickles with only the tiny ref, so the
    model is never re-shipped per batch or per task); scoring is one
    ``(rows × features) @ weights`` int64 matmul per batch.  All
    features are INTEGER counts reproducible in SQL (the
    ``quality_stats`` set plus ``n_chars``), so scores and the keep
    decision are exact cross-engine at any parallelism.  Overflow
    bound: |w|·n_chars summed over features must stay under 2^63 —
    fine for any real document and single-digit weights."""

    def __init__(self, weights_ref, bias: int, threshold: int,
                 text_col: str, id_col: str):
        self._wref = weights_ref
        self._w: np.ndarray | None = None
        self.bias, self.threshold = int(bias), int(threshold)
        self.text_col, self.id_col = text_col, id_col

    @property
    def w(self) -> np.ndarray:
        if self._w is None:
            # per-worker ray.get is plasma-cached and zero-copy
            self._w = np.asarray(ray.get(self._wref), dtype=np.int64)
        return self._w

    def _features(self, tab: pa.Table) -> np.ndarray:
        # null text carries no features; fill with "" here and let
        # __call__ drop the row (SQL's WHERE-on-NULL-score semantics —
        # a NaN feature would otherwise cast to int64 garbage)
        t = pc.fill_null(tab[self.text_col], "")
        f = np.empty((tab.num_rows, len(QUALITY_FEATURES)),
                     dtype=np.int64)

        def cnt(pattern: str) -> np.ndarray:
            return pc.cast(pc.count_substring_regex(t, pattern=pattern),
                           pa.int64()).to_numpy(zero_copy_only=False)

        f[:, 0] = pc.cast(pc.utf8_length(t), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        f[:, 1] = cnt(r"[A-Za-z]")
        f[:, 2] = cnt(r"[0-9]")
        f[:, 3] = cnt(r" ")
        f[:, 4] = cnt(r"[.,;:!?]")
        f[:, 5] = cnt(r"\S+")
        words = pc.split_pattern_regex(t, pattern=r"\s+")
        counts = pc.list_value_length(words).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.utf8_length(pc.list_flatten(words)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        mx = np.zeros(len(counts), dtype=np.int64)
        nz = counts > 0
        if nz.any():
            mx[nz] = np.maximum.reduceat(flat, starts[nz])
        f[:, 6] = mx
        return f

    def __call__(self, tab: pa.Table) -> pa.Table:
        score = self._features(tab) @ self.w + self.bias
        valid = pc.is_valid(tab[self.text_col]) \
            .to_numpy(zero_copy_only=False).astype(bool)
        keep = valid & (score >= self.threshold)
        out = pa.table({
            self.id_col: tab[self.id_col],
            "score": pa.array(score, type=pa.int64())})
        return out.filter(pa.array(keep))


def linear_quality_filter(
    ds: "rd.Dataset", text_col: str, id_col: str, *,
    weights, bias: int = 0, threshold: int = 0,
) -> "rd.Dataset":
    """Documents whose integer linear quality score clears
    ``threshold``: (id, score).  ``weights`` is ordered as
    :data:`QUALITY_FEATURES`.  See :class:`LinearQualityScorer` for
    the broadcast-model mechanics; for a heavyweight model pass the
    class to ``map_batches(..., concurrency=N)`` so Ray builds an
    actor pool and ``__init__`` runs once per actor."""
    w = np.asarray(weights, dtype=np.int64)
    if w.shape != (len(QUALITY_FEATURES),):
        raise ValueError(
            f"weights must have shape ({len(QUALITY_FEATURES)},) "
            f"ordered as {QUALITY_FEATURES}")
    ref = ray.put(w)
    scorer = LinearQualityScorer(ref, bias, threshold, text_col, id_col)
    return ds.select_columns([id_col, text_col]).map_batches(
        scorer, batch_format="pyarrow")


def approx_top_tokens(ds: "rd.Dataset", text_col: str, *, k: int = 20,
                      candidates_per_block: int | None = None,
                      w: int = 2048, d: int = 5) -> pa.Table:
    """Approximate corpus heavy hitters: ``(token, n_approx)``, top
    ``k`` by count-min-sketch estimate (desc, then token asc).

    Why it exists next to the exact :func:`top_k_tokens`: the exact
    form shuffles the full VOCABULARY — fine for words, ruinous for
    open vocabularies (URLs, n-grams, user ids) where distinct values
    scale with the corpus.  Here every block ships a CONSTANT-size
    partial instead: one ``w × d`` count-min sketch (mergeable by
    element-wise add) plus its local top-``candidates_per_block``
    token strings.  The driver merges O(blocks) sketches, queries the
    merged sketch only for the O(blocks × m) candidate union, and
    keeps the top k — no token exchange at all.

    Guarantees: CMS never underestimates; overestimate ≤ εN (ε≈e/w)
    with prob 1−δ (δ≈e^−d).  A global heavy hitter missing from every
    block's local top-m is possible in theory (adversarial spread) —
    raise ``candidates_per_block`` (default 4k) when k is tight.
    Returns a driver-side Table (k rows)."""
    from ..state.sketches import CountMin, hash_strings

    m = candidates_per_block or 4 * k

    def _partial(tab: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern_regex(
            pc.fill_null(tab[text_col], ""), pattern=r"\s+"))
        flat = flat.filter(pc.not_equal(flat, "")).combine_chunks()
        cms = CountMin(w=w, d=d)
        cms.update_hashes(hash_strings(flat))
        vc = flat.value_counts()
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        order = np.argsort(-counts, kind="stable")[:m]
        cand = vc.field("values").take(pa.array(order))
        return pa.table({
            "cms": pa.array([cms.to_bytes()], type=pa.binary()),
            "cand": pa.array([cand.to_pylist()],
                             type=pa.list_(pa.string()))})

    parts = ds.select_columns([text_col]).map_batches(
        _partial, batch_format="pyarrow").take_all()
    merged: CountMin | None = None
    cand_set: set[str] = set()
    for p in parts:
        c = CountMin.from_bytes(p["cms"])
        merged = c if merged is None else merged.merge(c)
        cand_set.update(p["cand"])
    if merged is None or not cand_set:
        return pa.table({"token": pa.array([], type=pa.string()),
                         "n_approx": pa.array([], type=pa.int64())})
    cands = sorted(cand_set)
    ests = np.array([merged.query_string(t) for t in cands],
                    dtype=np.int64)
    order = np.lexsort((np.array(cands, dtype=object), -ests))[:k]
    return pa.table({
        "token": pa.array([cands[i] for i in order]),
        "n_approx": pa.array(ests[order])})


def build_vocab(ds: "rd.Dataset", text_col: str, *, min_count: int = 2,
                buckets: int | None = None) -> "rd.Dataset":
    """Deterministic VOCABULARY construction: corpus-wide whitespace
    token counts, thresholded at ``min_count``, with contiguous ids
    assigned by ``(count desc, token asc)`` — the classic
    frequency-ordered vocab an LLM tokenizer training step emits,
    bit-stable across layouts and engines.

    Scale shape: blocks reduce to distinct (token, count) partials
    before the shuffle (only the vocabulary moves), the bucketed
    exchange sums and thresholds per token, and id assignment — the
    one inherently GLOBAL step — runs as a single task over the
    thresholded vocab, which ``min_count`` has already shrunk to the
    kept-vocabulary size (ids need a total order; that is the
    sequential floor, not an implementation shortcut)."""
    from ..pipelines.relational import agg_named, bucketed_map_groups

    def _partial(tab: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern_regex(
            pc.fill_null(tab[text_col], ""), pattern=r"\s+"))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.combine_chunks().value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    partial = ds.select_columns([text_col]).map_batches(
        _partial, batch_format="pyarrow")

    def _sum(tab: pa.Table) -> pa.Table:
        out = agg_named(tab, ["token"], [("n", "sum")], ["n"])
        return out.filter(pc.greater_equal(out["n"], min_count))

    summed = bucketed_map_groups(partial, ["token"], _sum,
                                 buckets=buckets, sort_within=False)

    def _assign(tab: pa.Table) -> pa.Table:
        tab = tab.sort_by([("n", "descending"), ("token", "ascending")])
        return tab.append_column(
            "id", pa.array(np.arange(tab.num_rows, dtype=np.int64)))

    # batch_size=None -> the whole (single) block in one call, so ids
    # are assigned over the full vocab, never per-batch from 0
    return summed.repartition(1).map_batches(
        _assign, batch_format="pyarrow", batch_size=None)


def encode_with_vocab(ds: "rd.Dataset", id_col: str, text_col: str,
                      vocab: "rd.Dataset", *,
                      buckets: int | None = None) -> "rd.Dataset":
    """Tokenize the corpus against a TRAINED vocabulary (the
    :func:`build_vocab` output, or any ``(token, id)`` table): per
    document, whitespace-tokenize and map each token to its vocab id;
    out-of-vocabulary tokens count as OOV.  Output is per-doc
    ``(id, n_tok, n_oov, sum_id, sum_id2)`` — token count, OOV count
    and order-independent integer checksums of the in-vocab ids (Σid,
    Σid²), exact in int64.

    Scale shape: the vocab is the SMALL side — materialized once,
    ``ray.put`` into the object store, and every encoding task maps
    its batch with one zero-copy ``pc.index_in`` against the shared
    token array; the corpus itself never shuffles (per-doc outputs
    are computed block-locally with a value_counts-style hash agg,
    no row loops).  OOV is a lookup miss, not an error — the id -1
    convention every tokenizer uses."""
    vtab = pa.concat_tables(
        ray.get(vocab.select_columns(["token", "id"]).to_arrow_refs()))
    vref = ray.put((vtab["token"].combine_chunks(),
                    vtab["id"].combine_chunks()
                    .to_numpy(zero_copy_only=False).astype(np.int64)))

    def _encode(tab: pa.Table) -> pa.Table:
        tokens, ids = ray.get(vref)
        toks = pc.split_pattern_regex(
            pc.fill_null(tab[text_col], ""), pattern=r"\s+")
        flat = pc.list_flatten(toks).combine_chunks()
        ok = pc.not_equal(flat, "")
        # doc index of every token via the list offsets
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(len(lens)), lens)
        okn = ok.to_numpy(zero_copy_only=False)
        flat = flat.filter(ok)
        doc_of = doc_of[okn]
        idx = pc.index_in(flat, value_set=tokens)
        miss = pc.is_null(idx).to_numpy(zero_copy_only=False)
        pos = pc.fill_null(idx, 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        vid = np.where(miss, -1, ids[pos])
        n_docs = tab.num_rows
        n_tok = np.bincount(doc_of, minlength=n_docs).astype(np.int64)
        n_oov = np.bincount(doc_of, weights=miss.astype(np.int64),
                            minlength=n_docs).astype(np.int64)
        inv = ~miss
        # exact int64 scatter-adds (a float bincount would lose
        # integer exactness past 2^53 on a big vocab)
        sum_id = np.zeros(n_docs, dtype=np.int64)
        sum_id2 = np.zeros(n_docs, dtype=np.int64)
        np.add.at(sum_id, doc_of[inv], vid[inv])
        np.add.at(sum_id2, doc_of[inv], vid[inv] * vid[inv])
        return pa.table({
            id_col: tab[id_col],
            "n_tok": pa.array(n_tok), "n_oov": pa.array(n_oov),
            "sum_id": pa.array(sum_id), "sum_id2": pa.array(sum_id2)})

    return ds.select_columns([id_col, text_col]).map_batches(
        _encode, batch_format="pyarrow")


def token_cooccurrence(ds: "rd.Dataset", text_col: str, *,
                       window: int = 5, vocab_size: int = 30,
                       min_count: int = 2,
                       buckets: int | None = None) -> "rd.Dataset":
    """Windowed token CO-OCCURRENCE counts over the top-``vocab_size``
    vocabulary — the word2vec / GloVe statistics pass: for every
    unordered pair of in-vocab tokens appearing within ``window``
    ORIGINAL positions of each other in a document (OOV tokens still
    occupy positions), the corpus-wide pair count.  Pairs are
    canonicalized by vocab id (id_a ≤ id_b — frequency order, ties by
    token), so the output is ``(tok_a, tok_b, id_a, id_b, n_pair)``.

    Scale shape: the vocab comes from :func:`build_vocab` (partial
    counts, vocabulary-sized exchange) and is ``ray.put`` once; each
    batch maps tokens to ids with one ``index_in``, expands pairs by
    ``window`` shifted-array comparisons (no per-token Python), and
    pre-aggregates its ``(id_a, id_b)`` partials — only the
    O(vocab²)-bounded pair table ever shuffles."""
    vocab = build_vocab(ds, text_col, min_count=min_count,
                        buckets=buckets)

    def _cut(tab: pa.Table) -> pa.Table:
        return tab.filter(pc.less(tab["id"], vocab_size))

    vtab = pa.concat_tables(
        ray.get(vocab.map_batches(_cut, batch_format="pyarrow")
                .to_arrow_refs()))
    vref = ray.put((vtab["token"].combine_chunks(),
                    vtab["id"].combine_chunks()
                    .to_numpy(zero_copy_only=False).astype(np.int64)))

    def _pairs(tab: pa.Table) -> pa.Table:
        tokens, ids = ray.get(vref)
        toks = pc.split_pattern_regex(
            pc.fill_null(tab[text_col], ""), pattern=r"\s+")
        flat = pc.list_flatten(toks).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(len(lens)), lens)
        # drop the empty split artifacts FIRST so positions equal the
        # \\S+ token sequence; OOV tokens keep their positions (window
        # distances span them), they just can't pair
        ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(ok))
        doc_of = doc_of[ok]
        idx = pc.index_in(flat, value_set=tokens)
        miss = pc.is_null(idx).to_numpy(zero_copy_only=False)
        pos = pc.fill_null(idx, 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        vid = np.where(miss, -1, ids[pos])
        n = len(vid)
        parts = []
        for d in range(1, window + 1):
            if n <= d:
                break
            a, b = vid[:-d], vid[d:]
            m = (a >= 0) & (b >= 0) & (doc_of[:-d] == doc_of[d:])
            if not m.any():
                continue
            lo = np.minimum(a[m], b[m])
            hi = np.maximum(a[m], b[m])
            parts.append(pa.table({
                "id_a": pa.array(lo), "id_b": pa.array(hi),
                "__one": pa.array(np.ones(len(lo), np.int64))}))
        if not parts:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "n_pair": pa.array([], pa.int64())})
        from ..pipelines.relational import agg_named
        return agg_named(pa.concat_tables(parts), ["id_a", "id_b"],
                         [("__one", "sum")], ["n_pair"])

    from ..pipelines.relational import agg_named, bucketed_map_groups
    summed = bucketed_map_groups(
        ds.select_columns([text_col]).map_batches(
            _pairs, batch_format="pyarrow"),
        ["id_a", "id_b"],
        lambda t: agg_named(t, ["id_a", "id_b"], [("n_pair", "sum")],
                            ["n_pair"]),
        buckets=buckets, sort_within=False)

    def _name(tab: pa.Table) -> pa.Table:
        tokens, ids = ray.get(vref)
        order = np.argsort(ids)
        tok_sorted = tokens.take(pa.array(order))
        ia = tab["id_a"].combine_chunks().to_numpy(
            zero_copy_only=False)
        ib = tab["id_b"].combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "tok_a": tok_sorted.take(pa.array(ia)),
            "tok_b": tok_sorted.take(pa.array(ib)),
            "id_a": tab["id_a"], "id_b": tab["id_b"],
            "n_pair": tab["n_pair"]})

    return summed.map_batches(_name, batch_format="pyarrow")


def bpe_pair_counts(ds: "rd.Dataset", text_col: str, *, k: int = 10,
                    ) -> "rd.Dataset":
    """One BPE-training MERGE STEP at corpus scale: count every
    adjacent BYTE pair inside whitespace tokens (never across token
    boundaries — the word-boundary convention) and return the top-``k``
    pairs by (count desc, pair asc) — exactly the statistic byte-level
    BPE consults to pick its next merge.  For an ASCII corpus byte
    pairs are character pairs, which is what the SQL mirror's
    ``substr`` sees; multibyte UTF-8 would count byte (not char)
    pairs, faithful to byte-level BPE.

    Fully vectorized and exchange-free: each block flattens its
    tokens, reads the flat UTF-8 buffer as one uint8 array, masks the
    in-token adjacent positions, and bincounts 16-bit pair codes into
    a CONSTANT 65536-slot vector — the only thing that ever leaves a
    block.  The driver sums |blocks| constant vectors; no vocabulary
    exchange at any size."""
    def _partial(tab: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(tab[text_col], ""), pattern=r"\s+")
        flat = pc.list_flatten(toks).combine_chunks()
        flat = flat.filter(pc.not_equal(flat, ""))
        if not len(flat):
            return pa.table({"code": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        arr = flat
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        # the hash_strings buffer convention: large_binary for int64
        # offsets, slice offset honored
        arr = pc.cast(arr, pa.large_binary())
        bufs = arr.buffers()
        off = np.frombuffer(bufs[1], dtype=np.int64,
                            count=len(arr) + 1, offset=arr.offset * 8)
        buf = np.frombuffer(bufs[2], dtype=np.uint8) \
            if bufs[2] is not None else np.empty(0, dtype=np.uint8)
        starts, ends = off[:-1], off[1:]
        # positions p with p and p+1 inside the SAME token
        n_pos = len(buf) - 1
        if n_pos <= 0:
            return pa.table({"code": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        in_tok = np.zeros(len(buf) + 1, dtype=np.int64)
        np.add.at(in_tok, starts, 1)
        np.add.at(in_tok, np.maximum(ends - 1, starts), -1)
        valid = np.cumsum(in_tok[:-1])[:n_pos] > 0
        codes = (buf[:-1].astype(np.int64) * 256 +
                 buf[1:].astype(np.int64))[valid]
        cnt = np.bincount(codes, minlength=65536)
        nz = np.flatnonzero(cnt)
        return pa.table({"code": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    acc = np.zeros(65536, dtype=np.int64)
    for r in ds.select_columns([text_col]).map_batches(
            _partial, batch_format="pyarrow").take_all():
        acc[r["code"]] += r["n"]
    order = np.lexsort((np.arange(65536), -acc))[:k]
    order = order[acc[order] > 0]
    pairs = [bytes([c // 256, c % 256]).decode("latin-1")
             for c in order]
    return rd.from_arrow(pa.table({
        "pair": pa.array(pairs, pa.string()),
        "n": pa.array(acc[order])}))


# ---------------------------------------------------------------------------
# Multi-merge BPE training over the distributed word-frequency table
# ---------------------------------------------------------------------------

def _bpe_word_table(ds: "rd.Dataset", text_col: str,
                    buckets=None) -> "rd.Dataset":
    """(word, count) over whitespace tokens — ONE exchange; BPE then
    trains on the distinct-word table (the HF/sentencepiece shape),
    so every later pass touches O(vocabulary), never the corpus."""
    from ..pipelines.relational import group_agg

    def _tok(tab: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(tab[text_col], ""), pattern=r"\s+")
        flat = pc.list_flatten(toks).combine_chunks()
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"word": flat})

    words = ds.select_columns([text_col]).map_batches(
        _tok, batch_format="pyarrow")
    return group_agg(words, ["word"], [("word", "count_all", "n")],
                     buckets=buckets)


def bpe_train(
    ds: "rd.Dataset", text_col: str, *, n_merges: int = 20,
    buckets=None,
) -> pa.Table:
    """Byte-level BPE TRAINING (Sennrich et al. 2016): ``n_merges``
    greedy merges, ties broken by smallest pair code — deterministic
    at any parallelism.  Returns the merge table
    ``(rank, sym_a, sym_b, new_id, weight)``.

    Distribution: the corpus collapses ONCE to the distinct
    (word, count) table (one exchange); every merge iteration is two
    map passes over that table — an exchange-free pair-count partial
    (per-block ``np.unique`` of 40-bit pair codes, driver folds
    O(blocks) dicts) and a broadcast merge-apply (vectorized
    run-aware greedy-left replacement, no Python per word).  Word
    pieces live as a flat int32 buffer + offsets, rebuilt in place
    per block."""
    base = _bpe_word_table(ds, text_col, buckets=buckets)

    def _init(tab: pa.Table) -> pa.Table:
        w = pc.cast(tab["word"], pa.large_binary()).combine_chunks()
        bufs = w.buffers()
        off = np.frombuffer(bufs[1], dtype=np.int64,
                            count=len(w) + 1, offset=w.offset * 8)
        data = np.frombuffer(bufs[2], dtype=np.uint8) \
            if bufs[2] is not None else np.empty(0, dtype=np.uint8)
        data = data[off[0]: off[-1]]
        off = off - off[0]
        return pa.table({
            "syms": pa.ListArray.from_arrays(
                pa.array(off, pa.int32()),
                pa.array(data.astype(np.int32), pa.int32())),
            "n": tab["n"]})

    state = base.map_batches(_init, batch_format="pyarrow") \
        .materialize()
    merges = []
    next_id = 256
    SHIFT = np.int64(1) << np.int64(20)

    def _pieces(tab: pa.Table):
        syms = tab["syms"].combine_chunks()
        flat = syms.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        offs = syms.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # a SLICED ListArray keeps raw offsets while flatten()
        # rebases the values — rebase offsets to match
        offs = offs - offs[0]
        cnt = pc.cast(tab["n"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return flat, offs, cnt

    for rank in range(n_merges):
        def _count(tab: pa.Table) -> pa.Table:
            flat, offs, cnt = _pieces(tab)
            if not len(flat):
                return pa.table({"code": pa.array([], pa.int64()),
                                 "w": pa.array([], pa.int64())})
            word_of = np.searchsorted(offs, np.arange(len(flat)),
                                      side="right") - 1
            ok = np.zeros(len(flat), dtype=bool)
            ok[:-1] = word_of[:-1] == word_of[1:]
            pos = np.flatnonzero(ok)
            codes = flat[pos] * SHIFT + flat[pos + 1]
            w = cnt[word_of[pos]]
            u, inv = np.unique(codes, return_inverse=True)
            ww = np.bincount(inv, weights=w).astype(np.int64)
            return pa.table({"code": pa.array(u),
                             "w": pa.array(ww)})

        agg: dict = {}
        for t in ray.get(state.map_batches(
                _count, batch_format="pyarrow").to_arrow_refs()):
            if t.num_rows == 0:
                # zero-row blocks bypass the UDF and keep the input
                # schema — nothing to fold either way
                continue
            for c, w in zip(t["code"].to_numpy(zero_copy_only=False),
                            t["w"].to_numpy(zero_copy_only=False)):
                agg[int(c)] = agg.get(int(c), 0) + int(w)
        if not agg:
            break
        best = min(agg, key=lambda c: (-agg[c], c))
        a, b = best >> 20, best & ((1 << 20) - 1)
        merges.append((rank + 1, int(a), int(b), next_id, agg[best]))
        new_id, pa_a, pa_b = next_id, a, b
        next_id += 1

        def _apply(tab: pa.Table, _a=pa_a, _b=pa_b,
                   _nid=new_id) -> pa.Table:
            flat, offs, cnt = _pieces(tab)
            if not len(flat):
                return tab
            word_of = np.searchsorted(offs, np.arange(len(flat)),
                                      side="right") - 1
            cand = np.zeros(len(flat), dtype=bool)
            cand[:-1] = (flat[:-1] == _a) & (flat[1:] == _b) \
                & (word_of[:-1] == word_of[1:])
            # greedy-left non-overlap: inside each RUN of consecutive
            # candidates keep alternating positions (aaa with (a,a)
            # merges the first pair only)
            p = np.flatnonzero(cand)
            if len(p):
                run_start = np.zeros(len(p), dtype=np.int64)
                new_run = np.concatenate([[True], p[1:] != p[:-1] + 1])
                run_ids = np.cumsum(new_run) - 1
                first = p[np.concatenate(
                    [[0], np.flatnonzero(new_run[1:]) + 1])]
                keep = ((p - first[run_ids]) % 2) == 0
                p = p[keep]
            sel = np.zeros(len(flat), dtype=bool)
            sel[p] = True
            drop = np.zeros(len(flat), dtype=bool)
            drop[p + 1] = True
            out = flat.copy()
            out[sel] = _nid
            kept = ~drop
            new_flat = out[kept]
            # new offsets: each word loses one symbol per applied merge
            merged_per_word = np.bincount(word_of[p],
                                          minlength=len(offs) - 1) \
                if len(p) else np.zeros(len(offs) - 1, dtype=np.int64)
            new_offs = offs - np.concatenate(
                [[0], np.cumsum(merged_per_word)])
            return pa.table({
                "syms": pa.ListArray.from_arrays(
                    pa.array(new_offs.astype(np.int32), pa.int32()),
                    pa.array(new_flat.astype(np.int32), pa.int32())),
                "n": tab["n"]})

        state = state.map_batches(_apply, batch_format="pyarrow") \
            .materialize()

    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "sym_a": pa.array([m[1] for m in merges], pa.int64()),
        "sym_b": pa.array([m[2] for m in merges], pa.int64()),
        "new_id": pa.array([m[3] for m in merges], pa.int64()),
        "weight": pa.array([m[4] for m in merges], pa.int64()),
    })


def bpe_encode(
    ds: "rd.Dataset", id_col: str, text_col: str, merges,
) -> "rd.Dataset":
    """Apply a trained BPE merge table (the output of
    :func:`bpe_train`: rank-ordered ``(sym_a, sym_b, new_id)`` rows)
    to the corpus: per document, the subword token count and exact
    order-independent id checksums ``(id_sum, id_sq_sum)`` — enough
    to verify any other implementation id-for-id without shipping the
    token streams anywhere.

    Embarrassingly parallel, NO shuffle: each block tokenizes its
    docs to words, lays the bytes out flat, and applies the merges IN
    RANK ORDER as k vectorized greedy-left passes over the whole
    block (the same run-aware non-overlap rule training used —
    encode/train can never disagree on a word).  Merges never cross
    word boundaries."""
    if isinstance(merges, pa.Table):
        merges = list(zip(merges["sym_a"].to_pylist(),
                          merges["sym_b"].to_pylist(),
                          merges["new_id"].to_pylist()))
    merges = [(int(a), int(b), int(n)) for a, b, n in merges]

    def _f(tab: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(tab[text_col], ""), pattern=r"\s+")
        flat_words = pc.list_flatten(toks).combine_chunks()
        doc_of_word = pc.list_parent_indices(toks) \
            .to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat_words, "")
        doc_of_word = doc_of_word[
            keep.to_numpy(zero_copy_only=False)]
        flat_words = flat_words.filter(keep)
        w = pc.cast(flat_words, pa.large_binary())
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        bufs = w.buffers()
        off = np.frombuffer(bufs[1], dtype=np.int64,
                            count=len(w) + 1, offset=w.offset * 8)
        data = np.frombuffer(bufs[2], dtype=np.uint8) \
            if bufs[2] is not None else np.empty(0, dtype=np.uint8)
        data = data[off[0]: off[-1]]
        off = off - off[0]
        flat = data.astype(np.int64)
        # word id per byte; stays aligned through merge passes
        word_of = np.repeat(np.arange(len(off) - 1, dtype=np.int64),
                            np.diff(off))
        for a, b, nid in merges:
            if len(flat) < 2:
                break
            cand = np.zeros(len(flat), dtype=bool)
            cand[:-1] = (flat[:-1] == a) & (flat[1:] == b) \
                & (word_of[:-1] == word_of[1:])
            p = np.flatnonzero(cand)
            if not len(p):
                continue
            new_run = np.concatenate([[True], p[1:] != p[:-1] + 1])
            run_ids = np.cumsum(new_run) - 1
            first = p[np.flatnonzero(new_run)]
            p = p[((p - first[run_ids]) % 2) == 0]
            flat[p] = nid
            drop = np.zeros(len(flat), dtype=bool)
            drop[p + 1] = True
            flat = flat[~drop]
            word_of = word_of[~drop]
        # per-doc rollups over the surviving symbols
        n_docs = tab.num_rows
        doc_of_sym = doc_of_word[word_of] if len(word_of) else \
            np.empty(0, dtype=np.int64)
        n_tok = np.bincount(doc_of_sym, minlength=n_docs)
        id_sum = np.bincount(doc_of_sym, weights=flat,
                             minlength=n_docs).astype(np.int64)
        id_sq = np.bincount(doc_of_sym, weights=flat * flat,
                            minlength=n_docs).astype(np.int64)
        return pa.table({
            id_col: tab[id_col],
            "n_tokens": pa.array(n_tok.astype(np.int64)),
            "id_sum": pa.array(id_sum),
            "id_sq_sum": pa.array(id_sq)})

    return ds.select_columns([id_col, text_col]).map_batches(
        _f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PMI bigram collocations
# ---------------------------------------------------------------------------

def pmi_bigrams(ds: "rd.Dataset", text_col: str, *,
                min_count: int = 5,
                buckets: int | None = None) -> "rd.Dataset":
    """Pointwise-mutual-information scores for ADJACENT token bigrams
    (collocation mining, Church & Hanks 1990): tokens are the
    ``[a-z0-9]+`` runs of the lowercased text; for every ordered
    bigram seen at least ``min_count`` times,

        ``pmi = ln( P(x,y) / (P(x)·P(y)) )
              = ln( (c_xy·T·T) / (N·c_x·c_y) )``

    with ``c_xy`` the bigram count, ``c_x``/``c_y`` the corpus-wide
    unigram counts, ``T`` total tokens, ``N`` total bigrams — rounded
    half-away to 6 decimals (the SQL ``round`` contract; the float
    expression is evaluated in the oracle's left-associative order so
    both sides hold the same double).  Output: ``(tok_a, tok_b,
    n_pair, n_a, n_b, pmi)``.

    Distribution: the projected input is materialized ONCE and
    tokenized twice (unigram and bigram passes — both vectorized over
    the flat Arrow buffer, both pre-aggregated per batch so only
    count tables ever shuffle).  ``T``/``N`` fold per-block scalar
    partials on the driver (O(blocks)).  Unigram counts reach the
    surviving bigrams via two hash joins (``broadcast="auto"`` — at
    vocab scale the join buckets, it never assumes the vocabulary
    fits one heap)."""
    from ..pipelines.relational import (agg_named, bucketed_map_groups,
                                        hash_join)

    proj = ds.select_columns([text_col]).materialize()

    def _tokens(tab: pa.Table):
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(tab[text_col], "")),
            pattern="[^a-z0-9]+")
        flat = pc.list_flatten(toks).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(len(lens)), lens)
        ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return flat.filter(pa.array(ok)), doc_of[ok]

    def _uni_partial(tab: pa.Table) -> pa.Table:
        flat, _ = _tokens(tab)
        return agg_named(
            pa.table({"tok": flat,
                      "__one": np.ones(len(flat), np.int64)}),
            ["tok"], [("__one", "sum")], ["n"])

    def _big_partial(tab: pa.Table) -> pa.Table:
        flat, doc_of = _tokens(tab)
        if len(flat) < 2:
            return pa.table({"tok_a": pa.array([], pa.string()),
                             "tok_b": pa.array([], pa.string()),
                             "n_pair": pa.array([], pa.int64())})
        m = doc_of[:-1] == doc_of[1:]
        sel = pa.array(np.flatnonzero(m))
        return agg_named(
            pa.table({"tok_a": flat.take(sel),
                      "tok_b": flat.take(pc.add(sel, 1)),
                      "__one": np.ones(len(sel), np.int64)}),
            ["tok_a", "tok_b"], [("__one", "sum")], ["n_pair"])

    uni = bucketed_map_groups(
        proj.map_batches(_uni_partial, batch_format="pyarrow"),
        ["tok"],
        lambda t: agg_named(t, ["tok"], [("n", "sum")], ["n"]),
        buckets=buckets, sort_within=False).materialize()
    big = bucketed_map_groups(
        proj.map_batches(_big_partial, batch_format="pyarrow"),
        ["tok_a", "tok_b"],
        lambda t: agg_named(t, ["tok_a", "tok_b"],
                            [("n_pair", "sum")], ["n_pair"]),
        buckets=buckets, sort_within=False).materialize()

    def _tot(col):
        def _f(tab: pa.Table) -> pa.Table:
            return pa.table({"s": pa.array(
                [pc.sum(tab[col]).as_py() or 0], pa.int64())})
        return _f

    T = sum(t["s"].to_pylist()[0] for t in ray.get(
        uni.map_batches(_tot("n"), batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows)
    N = sum(t["s"].to_pylist()[0] for t in ray.get(
        big.map_batches(_tot("n_pair"), batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows)

    surviving = big.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_pair"], min_count)),
        batch_format="pyarrow")
    uni_a = uni.map_batches(
        lambda t: pa.table({"tok_a": t["tok"], "n_a": t["n"]}),
        batch_format="pyarrow")
    uni_b = uni.map_batches(
        lambda t: pa.table({"tok_b": t["tok"], "n_b": t["n"]}),
        batch_format="pyarrow")
    j = hash_join(surviving, uni_a, on="tok_a", broadcast="auto")
    j = hash_join(j, uni_b, on="tok_b", broadcast="auto")

    from . import round_half_away

    def _score(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return tab.append_column("pmi",
                                     pa.array([], pa.float64()))
        cxy = tab["n_pair"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        ca = tab["n_a"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        cb = tab["n_b"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        # left-associative, mirrors the oracle's
        # (c_xy::DOUBLE * T * T) / (N::DOUBLE * c_a * c_b)
        num = cxy * float(T) * float(T)
        den = float(N) * ca * cb
        pmi = round_half_away(np.log(num / den), 6)
        return tab.append_column("pmi", pa.array(pmi))

    return j.map_batches(_score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes (train + distributed inference)
# ---------------------------------------------------------------------------

def naive_bayes_classify(
    ds: "rd.Dataset", text_col: str, id_col: str, class_col: str, *,
    quant: int = 1_000_000, buckets: int | None = None,
) -> "rd.Dataset":
    """Train a multinomial Naive Bayes model on (text -> class) and
    score every document with it (the classic self-train/apply shape;
    split train/apply upstream for held-out scoring).  Tokens are the
    ``[a-z0-9]+`` runs of the lowercased text; Laplace (+1) smoothing;

        ``score(d, c) = prior_q(c) + Σ_tok cnt_d(tok) · lnq(c, tok)``

    with every log term INDIVIDUALLY quantized to an integer
    (``round_half_away(ln(·)·quant)``) before any summation, so the
    per-document class scores are exact int64 arithmetic — layout-
    independent, and bit-reproducible by a SQL oracle using the same
    per-term rounding.  Prediction = argmax, ties to the
    lexicographically smallest class.  Output: ``(id, pred,
    score_q)``.

    Distribution: training counts are per-batch partials folded by ONE
    exchange on token (class axis rides as columns after a per-token
    pivot); the finished model — vocab, per-class smoothed log table,
    priors — is ``ray.put`` ONCE (the vocabulary is the SMALL side, as
    in ``build_vocab``/``lm_trigram_score``), and inference is a
    single embarrassingly-parallel pass: a document's tokens never
    leave its batch, so scoring shuffles NOTHING."""
    from . import round_half_away
    from ..pipelines.relational import agg_named, bucketed_map_groups

    proj = ds.select_columns([id_col, text_col, class_col]) \
        .materialize()

    def _tokens(tab: pa.Table):
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(tab[text_col], "")),
            pattern="[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(len(lens)), lens)
        ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return flat.filter(pa.array(ok)), doc_of[ok]

    # ---- training counts --------------------------------------------------
    def _tok_class_partial(tab: pa.Table) -> pa.Table:
        flat, doc_of = _tokens(tab)
        cls = tab[class_col].combine_chunks().take(pa.array(doc_of))
        return agg_named(
            pa.table({"tok": flat, "cls": cls,
                      "__one": np.ones(len(flat), np.int64)}),
            ["tok", "cls"], [("__one", "sum")], ["n"])

    tok_cls = bucketed_map_groups(
        proj.map_batches(_tok_class_partial, batch_format="pyarrow"),
        ["tok", "cls"],
        lambda t: agg_named(t, ["tok", "cls"], [("n", "sum")], ["n"]),
        buckets=buckets, sort_within=False).materialize()

    def _doc_class_partial(tab: pa.Table) -> pa.Table:
        return agg_named(
            tab.append_column("__one",
                              pa.array(np.ones(tab.num_rows,
                                               np.int64))),
            [class_col], [("__one", "sum")], ["n_docs"])

    cls_parts = [t for t in ray.get(
        proj.map_batches(_doc_class_partial, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    cls_counts: dict[str, int] = {}
    for t in cls_parts:
        for c, n in zip(t[class_col].to_pylist(),
                        t["n_docs"].to_pylist()):
            cls_counts[c] = cls_counts.get(c, 0) + int(n)
    classes = sorted(cls_counts)
    n_classes = len(classes)
    n_docs = sum(cls_counts.values())

    # model table: one row per vocab token with the per-class count
    # vector — the vocabulary is the SMALL side, gathered once
    vocab_tabs = [t for t in ray.get(
        tok_cls.to_arrow_refs()) if t.num_rows]
    vt = pa.concat_tables(vocab_tabs) if vocab_tabs else pa.table(
        {"tok": pa.array([], pa.string()),
         "cls": pa.array([], pa.string()),
         "n": pa.array([], pa.int64())})
    toks_np = vt["tok"].combine_chunks()
    cls_idx = np.searchsorted(
        np.array(classes),
        np.asarray(vt["cls"].combine_chunks().to_numpy(
            zero_copy_only=False), dtype=object)) \
        if vt.num_rows else np.zeros(0, np.int64)
    vocab, tok_inv = np.unique(
        np.asarray(toks_np.to_numpy(zero_copy_only=False),
                   dtype=object), return_inverse=True) \
        if vt.num_rows else (np.zeros(0, dtype=object),
                             np.zeros(0, np.int64))
    counts = np.zeros((len(vocab), n_classes), dtype=np.int64)
    if vt.num_rows:
        counts[tok_inv, cls_idx] = vt["n"].to_numpy(
            zero_copy_only=False)
    V = len(vocab)
    tok_totals = counts.sum(axis=0)                # per-class tokens
    denom = (tok_totals + V).astype(np.float64)
    lnq = round_half_away(
        np.log((counts + 1).astype(np.float64) / denom[None, :])
        * quant, 0).astype(np.int64)
    priors = round_half_away(
        np.log(np.array([cls_counts[c] for c in classes],
                        np.float64) / float(n_docs)) * quant,
        0).astype(np.int64)
    model = ray.put((pa.array(list(vocab), type=pa.string()),
                     lnq, priors, classes))

    # ---- inference (no shuffle) -------------------------------------------
    def _score(tab: pa.Table, _m=model) -> pa.Table:
        vocab_arr, lnq_m, priors_v, classes_l = ray.get(_m)
        flat, doc_of = _tokens(tab)
        scores = np.tile(priors_v, (tab.num_rows, 1))
        if len(flat):
            idx = pc.index_in(flat, value_set=vocab_arr)
            # same-corpus train/apply: every token is in the vocab;
            # an OOV token (held-out apply) contributes the smoothed
            # zero-count term
            miss = pc.is_null(idx).to_numpy(zero_copy_only=False)
            pos = pc.fill_null(idx, 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            occ = np.where(miss[:, None],
                           round_half_away(
                               np.log(1.0 / denom) * quant,
                               0).astype(np.int64)[None, :],
                           lnq_m[pos])
            np.add.at(scores, doc_of, occ)
        pred_i = np.argmax(scores, axis=1)        # first max = lex min
        score_q = scores[np.arange(tab.num_rows), pred_i]
        return pa.table({
            id_col: tab[id_col],
            "pred": pa.array([classes_l[i] for i in pred_i],
                             type=pa.string()),
            "score_q": pa.array(score_q)})

    return proj.map_batches(_score, batch_format="pyarrow")


def kl_divergence_by_group(
    ds: "rd.Dataset", text_col: str, group_col: str, *,
    quant: int = 1_000_000_000, buckets: int | None = None,
) -> pa.Table:
    """Pairwise Kullback-Leibler divergence between the unigram token
    distributions of every ordered group pair (corpus-drift /
    source-contamination diagnostics):

        ``KL(a ‖ b) = Σ_tok p_a(tok) · ln(p_a(tok) / p_b(tok))``

    with Laplace-smoothed ``p_g(tok) = (n_g,tok + 1) / (N_g + V)``
    over the UNION vocabulary (V = corpus distinct tokens), every
    term quantized to an integer (``round_half_away(term · quant)``)
    before summation — the sum is an exact int64 fold, bit-equal to a
    SQL oracle applying the same per-term rounding, and independent
    of block layout or vocabulary iteration order.

    Output (driver-side table, O(groups²) rows): ``(src, dst,
    kl_q)``.

    Distribution: one token exchange builds the per-token count
    vector across groups (same shape as Naive Bayes training); each
    exchange bucket then folds ITS vocabulary slice's quantized terms
    for all group pairs — only O(groups²) integer partials ever
    reach the driver, the vocabulary never does."""
    from . import round_half_away
    from ..pipelines.relational import (agg_named, bucketed_map_groups,
                                        segment_starts)

    proj = ds.select_columns([text_col, group_col])

    def _partial(tab: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(tab[text_col], "")),
            pattern="[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        row_of = np.repeat(np.arange(len(lens)), lens)
        ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        grp = tab[group_col].combine_chunks().take(
            pa.array(row_of[ok]))
        return agg_named(
            pa.table({"tok": flat.filter(pa.array(ok)), "grp": grp,
                      "__one": np.ones(int(ok.sum()), np.int64)}),
            ["tok", "grp"], [("__one", "sum")], ["n"])

    tok_grp = bucketed_map_groups(
        proj.map_batches(_partial, batch_format="pyarrow"),
        ["tok", "grp"],
        lambda t: agg_named(t, ["tok", "grp"], [("n", "sum")], ["n"]),
        buckets=buckets, sort_within=False).materialize()

    # per-group token totals: sum-decomposable, safe to fold from
    # arbitrarily split blocks of the exchange output
    totals: dict[str, int] = {}
    for t in ray.get(tok_grp.map_batches(
            lambda tb: (agg_named(tb, ["grp"], [("n", "sum")],
                                  ["n_tok"]) if tb.num_rows else
                        pa.table({"grp": pa.array([], pa.string()),
                                  "n_tok": pa.array([], pa.int64())})),
            batch_format="pyarrow").to_arrow_refs()):
        if t.num_rows == 0:
            continue
        for g, n in zip(t["grp"].to_pylist(), t["n_tok"].to_pylist()):
            totals[g] = totals.get(g, 0) + int(n)
    # vocab size: distinct-token counting needs COMPLETE token groups
    # (Ray splits exchange-output blocks mid-group), so it runs inside
    # a token-keyed gather where completeness is guaranteed
    v_total = 0
    for t in ray.get(bucketed_map_groups(
            tok_grp, ["tok"],
            lambda tb: pa.table({"v": pa.array(
                [int(pc.count_distinct(tb["tok"]).as_py())
                 if tb.num_rows else 0], pa.int64())}),
            buckets=buckets, sort_within=False).to_arrow_refs()):
        v_total += int(sum(t["v"].to_pylist()))
    groups = sorted(totals)
    k = len(groups)
    denom = np.array([totals[g] for g in groups],
                     dtype=np.float64) + v_total
    dref = ray.put((groups, denom, v_total, quant))

    def _pair_partial(tab: pa.Table, _d=dref) -> pa.Table:
        groups_l, denom_v, V, q = ray.get(_d)
        kk = len(groups_l)
        if tab.num_rows == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        tab = tab.sort_by([("tok", "ascending"), ("grp", "ascending")])
        new = segment_starts(tab, ["tok"])
        seg = np.cumsum(new) - 1
        gi = np.searchsorted(
            np.array(groups_l),
            np.asarray(tab["grp"].combine_chunks().to_numpy(
                zero_copy_only=False), dtype=object))
        n = tab["n"].combine_chunks().to_numpy(zero_copy_only=False)
        n_seg = int(seg[-1]) + 1
        counts = np.zeros((n_seg, kk), dtype=np.int64)
        counts[seg, gi] = n
        p = (counts + 1).astype(np.float64) / denom_v[None, :]
        lp = np.log(p)
        out_i, out_j, out_s = [], [], []
        for i in range(kk):
            for j in range(kk):
                if i == j:
                    continue
                term = p[:, i] * (lp[:, i] - lp[:, j])
                s = int(round_half_away(term * q, 0)
                        .astype(np.int64).sum())
                out_i.append(i)
                out_j.append(j)
                out_s.append(s)
        return pa.table({"i": pa.array(out_i, pa.int64()),
                         "j": pa.array(out_j, pa.int64()),
                         "s": pa.array(out_s, pa.int64())})

    pair_ds = bucketed_map_groups(tok_grp, ["tok"], _pair_partial,
                                  buckets=buckets, sort_within=False)
    acc = np.zeros((k, k), dtype=object)
    for t in ray.get(pair_ds.to_arrow_refs()):
        for i, j, s in zip(t["i"].to_pylist(), t["j"].to_pylist(),
                           t["s"].to_pylist()):
            acc[i, j] += s
    # tokens absent from the exchange output contribute NOTHING extra:
    # the union vocabulary is exactly the exchanged token set, and
    # every (tok, pair) term was folded by the bucket owning the token
    out_a, out_b, out_q = [], [], []
    for i in range(k):
        for j in range(k):
            if i != j:
                out_a.append(groups[i])
                out_b.append(groups[j])
                out_q.append(int(acc[i, j]))
    return pa.table({"src": pa.array(out_a, pa.string()),
                     "dst": pa.array(out_b, pa.string()),
                     "kl_q": pa.array(out_q, pa.int64())})
