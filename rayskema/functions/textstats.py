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

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


def lang_id(ds: "rd.Dataset", text_col: str, id_col: str) -> "rd.Dataset":
    # a picklable INSTANCE runs as stateless tasks on the warm worker
    # pool (patterns are tiny strings; arrow compiles per kernel call)
    # — actor spawn costs seconds on this hardware class and buys
    # nothing for light per-stage state
    stage = LangIdStage(text_col, id_col)
    return ds.select_columns([id_col, text_col]).map_batches(
        stage, batch_format="pyarrow")


def fingerprint_md5(ds: "rd.Dataset", text_col: str,
                    id_col: str) -> "rd.Dataset":
    """(id, fp) — lowercase-hex MD5 of the UTF-8 text (content hash;
    matches any SQL engine's md5())."""

    def _fp(tab: pa.Table) -> pa.Table:
        from . import binary_buffers
        offsets, mv, null_mask = binary_buffers(tab[text_col])
        empty = memoryview(b"")
        # hash zero-copy slices of the flat buffer: no per-row Python
        # string round-trip (hashing is the work; slicing is free).
        # Null slots hash md5("") regardless of their offset extent.
        n = len(offsets) - 1
        fps = [hashlib.md5(
            empty if null_mask is not None and null_mask[i]
            else mv[offsets[i]:offsets[i + 1]]).hexdigest()
            for i in range(n)]
        return pa.table({id_col: tab[id_col],
                         "fp": pa.array(fps, type=pa.string())})

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
