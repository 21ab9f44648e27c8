"""Deterministic synthetic transcript fixtures (FIXTURES.md).

Generates the transcript table shape from BASELINE.json's ``input_hint``
(`conv_id, turn_idx, role, text, tool, ts`) fully vectorized with numpy
(no Python per-row loops — generation must not dominate benchmarks),
plus:

- ``conversations.parquet`` — referential-integrity manifest
  (conv_id, n_turns);
- a corrupt variant with ~2% seeded mutations, one class per reference
  issue code (mutation classes applied to DISJOINT conversations so the
  expected-violation oracle stays local), and the companion golden
  ``violations_expected.parquet`` sorted by (conv_id, turn_idx, path,
  code) — reference corpus analogue: /root/reference/dsl/*_test.go,
  api_error_model_test.go, parse_enforce_test.go;
- ``baseline_profile.bin`` — serialized role histogram + text-length
  t-digest captured from the clean table (drift reference);
- a drifted variant (role mix skewed, text lengths doubled) that must
  FAIL the KS/PSI checks.

Layout: 16 Parquet files hash-bucketed by conv_id + special shards
(`part-overflow` with turn_idx:int64 and one overflowing value,
`part-extra` with an undeclared column, `part-dup` carrying duplicate
rows OUT of their home bucket so only a shuffle can find them — the
north rule's cross-partition duplicate case).
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .state.sketches import ColumnProfile, hash_strings

EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp (us)
N_BUCKETS = 16
# bump when the generated corpus / expected violations change shape so
# cached fixture dirs (entry fixture, bench corpora) regenerate
FIXTURE_VERSION = 2
TOOL_POOL = np.array(["search", "calculator", "browser", "python",
                      "sql_query", "retrieval"], dtype=object)


def _conv_ids(n_conv: int, offset: int = 0) -> np.ndarray:
    # width sized to the largest id: a fixed U8 silently TRUNCATES ids
    # past 1e8 (conv 100,000,000 collided with 10,000,000 — cross-chunk
    # duplicate keys at ~700M turns).  Floor stays 8 so every existing
    # fixture (<1e8 conversations) is byte-identical; wider chunks
    # yield longer ids, which never collide with zero-filled 8-wide
    # ones
    hi = offset + max(n_conv, 1) - 1
    width = max(8, len(str(hi)))
    return np.char.add("conv_", np.char.zfill(
        np.arange(offset, offset + n_conv).astype(f"U{width}"), width))


def gen_clean(n_turns_target: int, seed: int = 42, *,
              drifted: bool = False, conv_offset: int = 0) -> pa.Table:
    """Vectorized clean transcript table, sorted by (conv_id, turn_idx).

    ``conv_offset`` shifts the conversation id range so corpora larger
    than memory can be generated in disjoint chunks (the flat text
    index array is ~8 bytes per text byte — ~50GB at 96M turns)."""
    rng = np.random.default_rng([seed, 1])
    n_conv = max(2, n_turns_target // 7)
    counts = rng.integers(2, 13, size=n_conv).astype(np.int64)
    counts[0] = int(np.median(counts)) * 50  # hot conversation (skew fixture)
    total = int(counts.sum())
    conv_ids = _conv_ids(n_conv, conv_offset)
    conv_rep = np.repeat(conv_ids, counts)
    conv_ordinal = np.repeat(np.arange(n_conv), counts)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    turn_idx = (np.arange(total) - np.repeat(offsets, counts)).astype(np.int32)

    # roles: t==0 -> system; else tool on a deterministic stride, then
    # alternate user/assistant. Drifted variant skews toward assistant.
    mod = (turn_idx.astype(np.int64) + conv_ordinal) % 7
    role = np.where(turn_idx % 2 == 1, "user", "assistant").astype(object)
    if drifted:
        role[(turn_idx % 4 == 1)] = "assistant"
    role[mod == 3] = "tool"
    role[turn_idx == 0] = "system"

    tool = np.full(total, None, dtype=object)
    is_tool = role == "tool"
    tool[is_tool] = TOOL_POOL[conv_ordinal[is_tool] % len(TOOL_POOL)]

    # text: lognormal lengths sliced out of a random char pool
    lengths = np.clip(rng.lognormal(4.0, 0.6, size=total), 1, 400).astype(np.int64)
    if drifted:
        lengths = np.clip(lengths * 2, 1, 800)
    pool_size = 1 << 20
    pool = rng.integers(97, 123, size=pool_size, dtype=np.uint8)  # a-z
    pool[rng.integers(0, pool_size, size=pool_size // 8)] = 32     # spaces
    starts = rng.integers(0, pool_size - 801, size=total)
    str_offsets = np.zeros(total + 1, dtype=np.int32)
    np.cumsum(lengths, out=str_offsets[1:])
    nbytes = int(str_offsets[-1])
    idx = np.repeat(starts, lengths) + (
        np.arange(nbytes) - np.repeat(str_offsets[:-1].astype(np.int64), lengths))
    data = pool[idx]
    text = pa.StringArray.from_buffers(
        total, pa.py_buffer(str_offsets.tobytes()), pa.py_buffer(data.tobytes()))

    # ts: per-conversation start + cumulative positive increments
    incr = rng.integers(1, 60_000_000, size=total)  # 1..60s in us
    cum = np.cumsum(incr)
    seg_base = np.repeat(cum[offsets] - incr[offsets], counts)
    conv_start = EPOCH_US + conv_ordinal * 3_600_000_000
    ts = (conv_start + (cum - seg_base)).astype("datetime64[us]")

    return pa.table({
        "conv_id": pa.array(conv_rep, type=pa.string()),
        "turn_idx": pa.array(turn_idx, type=pa.int32()),
        "role": pa.array(role, type=pa.string()),
        "text": text,
        "tool": pa.array(tool, type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    })


def build_profile(table: pa.Table) -> ColumnProfile:
    """Role histogram + text-length t-digest + conv_id HLL (the drift
    baseline; see schema.DriftRule)."""
    import pyarrow.compute as pc

    prof = ColumnProfile.empty(["role"], ["text_len"])
    prof.row_count = table.num_rows
    for entry in pc.value_counts(table["role"]):
        prof.value_counts["role"][entry["values"].as_py()] = entry["counts"].as_py()
    tl = pc.binary_length(table["text"]).cast(pa.float64()).combine_chunks()
    prof.tdigests["text_len"].update(tl.to_numpy(zero_copy_only=False))
    prof.hll.update_hashes(hash_strings(table["conv_id"].combine_chunks()))
    return prof


# ---------------------------------------------------------------------------
# Corruption — mutation classes on disjoint conversations.
# Returns (tables per output file, expected violations table, manifest).
# ---------------------------------------------------------------------------

_EXPECT_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ("path", pa.string()), ("code", pa.string()), ("rule", pa.string()),
])


def _pick_convs(counts: np.ndarray, n_classes: int, per_class: int):
    """Deterministic disjoint conversation picks: conversations with
    ordinal >= 1 (skip the hot conv), striped by class."""
    n_conv = len(counts)
    picks = []
    stride = max(n_classes, (n_conv - 1) // max(1, per_class))
    for cls in range(n_classes):
        sel = np.arange(1 + cls, n_conv, stride)[:per_class]
        picks.append(sel)
    return picks


# One chunk's worth of generation + mutation + sharding.  Bounded
# memory: gen_clean's transient flat text index is ~8 bytes per text
# byte (~12GB at 24M turns) and the pandas mutation copy another few
# GB, so corpora beyond CHUNK_TURNS are generated in disjoint
# conversation ranges and written incrementally — the 96M endurance
# corpus OOM-killed a 128GB box when generated in one piece.
CHUNK_TURNS = 24_000_000


def _gen_chunk(n_turns_target: int, seed: int, *, corrupt: bool,
               drifted: bool, conv_offset: int, specials: bool,
               tdir: str, suffix: str) -> dict:
    """Generate, mutate and write ONE chunk's shards; returns the
    chunk's bookkeeping (expected violations, manifest entries,
    profile, row/conv counts)."""
    clean = gen_clean(n_turns_target, seed, drifted=drifted,
                      conv_offset=conv_offset)
    df = clean.to_pandas()  # mutation bookkeeping in pandas (small/medium scale)
    conv_of = df["conv_id"].to_numpy()
    uniq_convs, conv_first = np.unique(conv_of, return_index=True)
    counts = df.groupby("conv_id", sort=True).size()

    expected: list[tuple] = []
    extra_rows = []          # (dataframe rows) appended to part-dup
    manifest_drop: set = set()

    if corrupt:
        n_conv = len(uniq_convs)
        # ~2% of conversations at small scale, capped so fixture
        # generation stays fast at bench scale (the mutation loop is
        # per-conversation Python; the vectorized clean gen dominates)
        per_class = min(200, max(1, n_conv // 120))
        classes = ["dup", "null_text", "bad_role", "bad_tool", "tool_wrong_role",
                   "long_text", "empty_text", "gap", "neg", "ts_reg", "dangling",
                   "role_seq"]
        picks = _pick_convs(counts.to_numpy(), len(classes), per_class)
        # generation order is (conv, turn)-sorted => rows per conversation
        # are contiguous: [conv_first[c], conv_first[c] + n_turns[c])
        counts_arr = counts.reindex(uniq_convs).to_numpy()

        for cls_name, sel in zip(classes, picks):
            # last two conversations are reserved for the special shards
            sel = sel[sel < len(uniq_convs) - 2]
            for c in sel:
                rows = np.arange(conv_first[c], conv_first[c] + counts_arr[c])
                cid = uniq_convs[c]
                n = len(rows)
                if cls_name == "dup" and n >= 2:
                    r = rows[1]
                    extra_rows.append(df.iloc[[r]])
                    expected.append((cid, int(df.at[r, "turn_idx"]), "",
                                     "duplicate_key", "unique_turn"))
                elif cls_name == "null_text":
                    r = rows[1] if n >= 2 else rows[0]
                    df.at[r, "text"] = None
                    expected.append((cid, int(df.at[r, "turn_idx"]), "/text",
                                     "required", "text_required"))
                elif cls_name == "bad_role":
                    r = rows[1] if n >= 2 else rows[0]
                    # null the tool first so cross-field rules stay satisfied
                    if df.at[r, "role"] == "tool":
                        df.at[r, "tool"] = None
                    df.at[r, "role"] = "alien"
                    expected.append((cid, int(df.at[r, "turn_idx"]), "/role",
                                     "invalid_enum", "role_enum"))
                elif cls_name == "bad_tool":
                    tr = [r for r in rows if df.at[r, "role"] == "tool"]
                    if not tr:
                        continue
                    r = tr[0]
                    df.at[r, "tool"] = "BAD TOOL!"
                    expected.append((cid, int(df.at[r, "turn_idx"]), "/tool",
                                     "pattern", "tool_format"))
                elif cls_name == "tool_wrong_role":
                    ur = [r for r in rows if df.at[r, "role"] == "user"]
                    if not ur:
                        continue
                    r = ur[0]
                    df.at[r, "tool"] = "sneaky"
                    expected.append((cid, int(df.at[r, "turn_idx"]), "",
                                     "business_rule", "tool_iff_tool_role"))
                elif cls_name == "long_text":
                    r = rows[0]
                    df.at[r, "text"] = "x" * 5000
                    expected.append((cid, int(df.at[r, "turn_idx"]), "/text",
                                     "truncated", "text_bytes"))
                elif cls_name == "empty_text":
                    r = rows[0]
                    df.at[r, "text"] = ""
                    expected.append((cid, int(df.at[r, "turn_idx"]), "/text",
                                     "too_short", "text_bytes"))
                elif cls_name == "gap" and n >= 2:
                    r = rows[-1]  # move last turn far away => max != count-1
                    df.at[r, "turn_idx"] = np.int32(df.at[r, "turn_idx"] + 1000)
                    expected.append((cid, None, "/turn_idx",
                                     "aggregate_violation", "turn_idx_contiguous"))
                elif cls_name == "neg":
                    r = rows[0]  # first turn (idx 0) -> -3; order preserved
                    df.at[r, "turn_idx"] = np.int32(-3)
                    expected.append((cid, -3, "/turn_idx",
                                     "too_small", "turn_idx_nonneg"))
                    expected.append((cid, None, "/turn_idx",
                                     "aggregate_violation", "turn_idx_contiguous"))
                    # the system turn now sits at idx -3, not 0
                    expected.append((cid, -3, "",
                                     "business_rule", "role_seq_only_first"))
                elif cls_name == "ts_reg" and n >= 3:
                    r = rows[2]
                    df.at[r, "ts"] = df.at[rows[0], "ts"] - np.timedelta64(5, "s")
                    expected.append((cid, int(df.at[r, "turn_idx"]), "/ts",
                                     "business_rule", "ts_monotonic"))
                elif cls_name == "dangling":
                    manifest_drop.add(cid)
                    expected.append((cid, None, "/conv_id",
                                     "conflict", "conv_manifest"))
                elif cls_name == "role_seq":
                    # open the conversation with a non-system turn
                    r = rows[0]  # turn 0: role system, tool null
                    df.at[r, "role"] = "user"
                    expected.append((cid, 0, "", "business_rule",
                                     "role_seq_start"))
                    # and plant a stray system turn mid-conversation
                    mid = [r2 for r2 in rows[1:]
                           if df.at[r2, "role"] in ("user", "assistant")]
                    if mid:
                        r2 = mid[0]
                        df.at[r2, "role"] = "system"
                        expected.append((cid, int(df.at[r2, "turn_idx"]), "",
                                         "business_rule",
                                         "role_seq_only_first"))

    # ---- shard layout ----------------------------------------------------
    table = pa.Table.from_pandas(df, schema=clean.schema, preserve_index=False)
    bucket = (hash_strings(table["conv_id"].combine_chunks())
              % np.uint64(N_BUCKETS)).astype(np.int64)

    # special shards (corrupt only): overflow conv + extra-column conv pulled
    # out of their home buckets into dedicated files.
    special_overflow = special_extra = None
    if corrupt and specials:
        # overflow: last two conversations
        ov_conv = uniq_convs[-1]
        ex_conv = uniq_convs[-2]
        ov_mask = np.asarray(df["conv_id"] == ov_conv)
        ex_mask = np.asarray(df["conv_id"] == ex_conv)
        ov_tab = table.filter(pa.array(ov_mask))
        # write turn_idx as int64 with the LAST turn overflowing int32
        ti = ov_tab["turn_idx"].to_numpy().astype(np.int64)
        ti[-1] = 2**31 + 5
        ov_tab = ov_tab.set_column(
            1, pa.field("turn_idx", pa.int64()), pa.array(ti, type=pa.int64()))
        special_overflow = ov_tab
        n_ov = counts[ov_conv]
        expected.append((ov_conv, None, "/turn_idx", "overflow", "coerce"))
        expected.append((ov_conv, None, "/turn_idx", "required", "turn_idx_required"))
        expected.append((ov_conv, None, "/turn_idx",
                         "aggregate_violation", "declared_turns"))
        ex_tab = table.filter(pa.array(ex_mask))
        ex_tab = ex_tab.append_column(
            "debug", pa.array(["x"] * ex_tab.num_rows, type=pa.string()))
        special_extra = ex_tab
        expected.append((None, None, "/debug", "unknown_key", "schema"))
        keep = ~(ov_mask | ex_mask)
        table = table.filter(pa.array(keep))
        bucket = bucket[keep]

    for b in range(N_BUCKETS):
        part = table.filter(pa.array(bucket == b))
        pq.write_table(part.replace_schema_metadata(None),
                       os.path.join(tdir, f"part-{b:05d}{suffix}.parquet"))
    if special_overflow is not None:
        pq.write_table(special_overflow.replace_schema_metadata(None),
                       os.path.join(tdir, "part-overflow.parquet"))
    if special_extra is not None:
        pq.write_table(special_extra.replace_schema_metadata(None),
                       os.path.join(tdir, "part-extra.parquet"))
    if extra_rows:
        import pandas as pd
        dup_tab = pa.Table.from_pandas(pd.concat(extra_rows),
                                       schema=clean.schema, preserve_index=False)
        pq.write_table(dup_tab.replace_schema_metadata(None),
                       os.path.join(tdir, f"part-dup{suffix}.parquet"))

    man_convs = [c for c in uniq_convs if c not in manifest_drop]
    man_counts = counts.reindex(man_convs).to_numpy().astype(np.int32)
    return {"rows": clean.num_rows, "n_conv": len(uniq_convs),
            "expected": expected,
            "man_convs": man_convs, "man_counts": man_counts,
            "profile": build_profile(clean)}


def write_fixture(out_dir: str, n_turns_target: int, seed: int = 42, *,
                  corrupt: bool = False, drifted: bool = False,
                  chunk_turns: int = CHUNK_TURNS) -> dict:
    """Write the fixture to ``out_dir``. Returns a small info dict.

    Corpora up to ``chunk_turns`` are generated exactly as one chunk
    (byte-identical output to the historical single-shot writer);
    larger targets are split into disjoint conversation ranges,
    each generated/mutated/written with bounded memory, their
    manifests, baseline profiles (mergeable sketches) and expected
    violations merged at the end.  The special shards (overflow /
    extra-column) are emitted once, from the first chunk."""
    os.makedirs(out_dir, exist_ok=True)
    tdir = os.path.join(out_dir, "transcripts")
    os.makedirs(tdir, exist_ok=True)

    n_chunks = max(1, -(-n_turns_target // chunk_turns))
    per_chunk = -(-n_turns_target // n_chunks)
    expected: list[tuple] = []
    man_convs_all: list = []
    man_counts_all: list = []
    prof = None
    rows = n_conv_total = 0
    conv_offset = 0
    for i in range(n_chunks):
        n_i = min(per_chunk, n_turns_target - i * per_chunk)
        info = _gen_chunk(
            n_i,
            # distinct stream per chunk (same content as before when
            # n_chunks == 1); conversation ids stay globally unique
            # via conv_offset
            seed if n_chunks == 1 else seed + 7919 * i,
            corrupt=corrupt, drifted=drifted, conv_offset=conv_offset,
            specials=(i == 0), tdir=tdir,
            suffix="" if n_chunks == 1 else f"-c{i:02d}")
        expected.extend(info["expected"])
        man_convs_all.extend(info["man_convs"])
        man_counts_all.append(info["man_counts"])
        prof = info["profile"] if prof is None else \
            prof.merge(info["profile"])
        rows += info["rows"]
        n_conv_total += info["n_conv"]
        conv_offset += info["n_conv"]

    # ---- manifest --------------------------------------------------------
    pq.write_table(
        pa.table({"conv_id": pa.array(man_convs_all, type=pa.string()),
                  "n_turns": pa.array(np.concatenate(man_counts_all),
                                      type=pa.int32())}),
        os.path.join(out_dir, "conversations.parquet"))

    # ---- baseline profile (always from the clean generation) -------------
    with open(os.path.join(out_dir, "baseline_profile.bin"), "wb") as f:
        f.write(prof.to_bytes())

    # ---- expected violations (corrupt only) ------------------------------
    if corrupt:
        exp = pa.Table.from_pylist(
            [dict(zip(("conv_id", "turn_idx", "path", "code", "rule"), e))
             for e in expected], schema=_EXPECT_SCHEMA)
        exp = exp.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending"),
                           ("path", "ascending"), ("code", "ascending"),
                           ("rule", "ascending")])
        pq.write_table(exp, os.path.join(out_dir, "violations_expected.parquet"))

    with open(os.path.join(out_dir, "fixture_version.txt"), "w") as f:
        f.write(str(FIXTURE_VERSION))

    return {"rows": rows, "n_conv": n_conv_total,
            "dir": out_dir, "corrupt": corrupt, "version": FIXTURE_VERSION,
            "expected_violations": len(expected) if corrupt else 0}


def fixture_current(out_dir: str) -> bool:
    """True when ``out_dir`` holds a complete fixture written by THIS
    generator version — cached corpora from before a schema/corruption
    change must be regenerated, not reused."""
    try:
        with open(os.path.join(out_dir, "fixture_version.txt")) as f:
            return f.read().strip() == str(FIXTURE_VERSION)
    except OSError:
        return False
