"""Snapshot table layout — a minimal manifest-tracked Parquet table
(the public Iceberg/Delta *concepts*: manifest lists file-level
min/max stats, snapshots are immutable, HEAD flips atomically) sized
for this engine's needs:

- **File skipping**: ``read_snapshot(..., filter=[(col, op, lit)])``
  prunes whole files from the manifest stats BEFORE any task launches,
  then pushes the same predicate into the Parquet read for row-group
  pruning — at 100 TB the manifest prune is the difference between
  launching 10^5 read tasks and 10^2.
- **Atomic publish / resumable writers**: data files land under
  content+ordinal names (idempotent retries, same contract as
  ``write_ipc``/``write_orc``); a snapshot becomes visible only when
  the single ``HEAD`` pointer is ``os.replace``d — a reader never sees
  a half-written table.
- **Time travel / append**: every snapshot keeps its full file list;
  ``mode="append"`` chains the parent's files; any historical snapshot
  id remains readable.

This intentionally implements the 20% of a table format the engine
exercises (stats pruning, atomicity, append, history, keyed
MERGE/upsert and predicate DELETE — both stats-pruned so untouched
files carry by reference — and add-column read evolution via per-file
schema fingerprints) and none of the rest (contracts own schema
SEMANTICS — what columns mean and must satisfy; no catalog).
"""

from __future__ import annotations

import json
import os
import re
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

__all__ = ["write_snapshot", "read_snapshot", "snapshot_history",
           "compact_snapshot", "snapshot_changes", "upsert_snapshot",
           "delete_snapshot"]

_OPS = ("==", "<", "<=", ">", ">=")

_PLAN_CACHE: dict = {}


def _cached_plan(contract):
    """One ConstraintPlan compile per (process, contract) — the
    validated-commit entry callback runs per BLOCK inside write
    tasks, so the compile (regexes, kernels) must not repeat."""
    key = contract.schema_hash()
    plan = _PLAN_CACHE.get(key)
    if plan is None:
        from ..plan import ConstraintPlan, limit_arrow_threads
        limit_arrow_threads()
        plan = _PLAN_CACHE[key] = ConstraintPlan(contract)
    return plan


def _stats_supported(t: pa.DataType) -> bool:
    """Types whose min/max encode JSON-safely AND compare correctly
    against filter literals.  Anything else gets NO stats entry (the
    file is simply never pruned on that column) instead of crashing
    the manifest write or mis-pruning on a lexicographic surprise."""
    return (pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_timestamp(t) or pa.types.is_date(t))


def _stat_value(v, t: pa.DataType):
    """JSON-safe manifest encoding of a scalar (timestamps as int64
    µs, dates as int days — the type tag on the column entry maps
    filter literals into the same domain)."""
    if v is None:
        return None
    if pa.types.is_timestamp(t):
        return int(pa.scalar(v, type=t).cast(pa.int64()).as_py())
    if pa.types.is_date(t):
        return int(pa.scalar(v, type=t).cast(
            pa.date32()).cast(pa.int32()).as_py())
    return v.as_py() if isinstance(v, pa.Scalar) else v


def _col_stats(tab: pa.Table, col: str) -> dict | None:
    c = tab[col]
    t = c.type
    if not _stats_supported(t):
        return None
    entry = {"type": str(t),
             "null_count": int(c.null_count),
             "min": None, "max": None}
    if tab.num_rows > c.null_count:
        entry["min"] = _stat_value(pc.min(c), t)
        entry["max"] = _stat_value(pc.max(c), t)
    return entry


def _norm_lit(lit, type_str: str):
    """A filter literal in the same domain as the manifest stats."""
    if type_str.startswith("timestamp"):
        if isinstance(lit, (int, float)):
            return int(lit)
        return int(pa.scalar(lit).cast(
            pa.timestamp("us")).cast(pa.int64()).as_py())
    if type_str.startswith("date"):
        if isinstance(lit, (int, float)):
            return int(lit)
        return int(pa.scalar(lit).cast(
            pa.date32()).cast(pa.int32()).as_py())
    return lit


def _file_may_match(stats: dict, col: str, op: str, lit) -> bool:
    """Conservative manifest prune: False ONLY when the file's
    [min, max] range PROVES no row can satisfy the predicate.  Files
    with no stats for the column, or all-null columns, are kept."""
    s = stats.get(col)
    if s is None:
        return True
    lo, hi = s["min"], s["max"]
    if lo is None or hi is None:      # all-null column: predicate is
        return False                  # null -> no row matches
    lit = _norm_lit(lit, s["type"])
    if op == "==":
        return lo <= lit <= hi
    if op == "<":
        return lo < lit
    if op == "<=":
        return lo <= lit
    if op == ">":
        return hi > lit
    if op == ">=":
        return hi >= lit
    raise ValueError(f"op must be one of {_OPS}")


def _file_all_match(stats: dict, col: str, op: str, lit) -> bool:
    """True ONLY when the file's stats PROVE every row satisfies the
    predicate: no nulls (a null never satisfies) and the whole
    [min, max] range inside the predicate's region."""
    s = stats.get(col)
    if s is None or s.get("null_count", 1) != 0:
        return False
    lo, hi = s["min"], s["max"]
    if lo is None or hi is None:
        return False
    lit = _norm_lit(lit, s["type"])
    if op == "==":
        return lo == lit and hi == lit
    if op == "<":
        return hi < lit
    if op == "<=":
        return hi <= lit
    if op == ">":
        return lo > lit
    if op == ">=":
        return lo >= lit
    raise ValueError(f"op must be one of {_OPS}")


def _schema_fp(schema: pa.Schema) -> str:
    """Order-sensitive fingerprint of (name, type) pairs — manifest
    entries carry it so a read can detect mixed schemas (add-column
    evolution) without touching any parquet footer."""
    import hashlib
    sig = ";".join(f"{f.name}:{f.type}" for f in schema)
    return hashlib.md5(sig.encode()).hexdigest()[:12]


_BLOOM_HASHES = 4


def _bloom_hash(arr, type_str: str) -> "object":
    """Canonical uint64 hashes of key values for the manifest Bloom
    filter — the WRITE and READ paths must agree bit-for-bit, so both
    go through the manifest stat domain (timestamps as int64 µs,
    dates as int days) before the splitmix mix; strings use the
    engine's vectorized rolling hash."""
    import numpy as np

    from ..state.sketches import _hash64, hash_strings

    if type_str.startswith(("string", "large_string")):
        if isinstance(arr, (pa.Array, pa.ChunkedArray)):
            return hash_strings(arr)
        return hash_strings(pa.array([arr], type=pa.string()))
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        vals = pc.cast(arr, pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
    else:
        vals = np.array([_norm_lit(arr, type_str)], dtype=np.int64)
    return _hash64(vals.view(np.uint64))


def _bloom_positions(h, bits_log2: int):
    import numpy as np

    from ..state.sketches import _hash64

    mask = np.uint64((1 << bits_log2) - 1)
    h2 = _hash64(h)
    return [((h + np.uint64(i) * h2) & mask)
            for i in range(_BLOOM_HASHES)]


def _bloom_build(col, type_str: str, bits_log2: int) -> str:
    """Base64 Bloom bitmap over the column's non-null values."""
    import base64

    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    words = 1 << max(0, bits_log2 - 6)
    bm = np.zeros(words, dtype=np.uint64)
    if len(col):
        h = _bloom_hash(col, type_str)
        for pos in _bloom_positions(h, bits_log2):
            np.bitwise_or.at(
                bm, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)))
    return base64.b64encode(bm.tobytes()).decode("ascii")


def _bloom_may_contain(s: dict, lit) -> bool:
    """False ONLY when the file's Bloom filter PROVES the equality
    literal is absent.  Files without a bloom entry always pass."""
    b = s.get("bloom")
    if not b:
        return True
    import base64

    import numpy as np

    bm = np.frombuffer(base64.b64decode(b["b64"]), dtype=np.uint64)
    h = _bloom_hash(lit, s["type"])
    for pos in _bloom_positions(h, b["bits_log2"]):
        w = bm[int(pos[0]) >> 6]
        if not (int(w) >> (int(pos[0]) & 63)) & 1:
            return False
    return True


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "manifests")


def _head_path(root: str) -> str:
    return os.path.join(root, "HEAD")


def _read_head(root: str) -> int | None:
    try:
        with open(_head_path(root)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


# -- named refs: branches (movable) and tags (immutable) -------------------
#
# "main" is the HEAD file (unchanged layout — every pre-branching table
# is a main-only table); other branches live in refs/heads/<name>, tags
# in refs/tags/<name>, each a single file holding a snapshot id flipped
# with the same atomic os.replace as HEAD.  Snapshot ids are allocated
# globally (max manifest + 1) so two branches never collide.

def _ref_file(root: str, name: str, kind: str = "heads") -> str:
    if name == "main":
        return _head_path(root)
    if "/" in name or name.startswith("."):
        raise ValueError(f"bad ref name {name!r}")
    return os.path.join(root, "refs", kind, name)


def _read_ref(root: str, name: str = "main") -> int | None:
    if name != "main":
        try:
            with open(_ref_file(root, name, "heads")) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None
    return _read_head(root)


def _write_ref(root: str, name: str, snap_id: int,
               kind: str = "heads") -> None:
    if kind == "heads" and name != "main" and \
            os.path.exists(_ref_file(root, name, "tags")):
        # a branch shadowing an existing tag would silently hijack
        # the "immutable" name through resolve_ref's branch priority
        raise FileExistsError(
            f"{name!r} is a tag; tags are immutable commit targets")
    path = _ref_file(root, name, kind)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(str(snap_id))
    os.replace(tmp, path)


def _next_snap_id(root: str) -> int:
    """Globally-unique snapshot id: max committed manifest + 1 (a
    per-branch head+1 would collide across branches)."""
    mdir = _manifest_dir(root)
    best = 0
    try:
        names = os.listdir(mdir)
    except FileNotFoundError:
        return 1
    for n in names:
        if n.startswith("snap-") and n.endswith(".json"):
            try:
                best = max(best, int(n[5:-5]))
            except ValueError:
                pass
    return best + 1


def resolve_ref(root: str, ref: str = "main") -> int | None:
    """Resolve main / a branch / a tag / a literal snapshot-id string
    to a snapshot id (branch wins over tag on a name collision)."""
    got = _read_ref(root, ref)
    if got is not None:
        return got
    try:
        with open(_ref_file(root, ref, "tags")) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        pass
    try:
        return int(ref)
    except ValueError:
        return None


def create_branch(root: str, name: str, *, at: int | None = None,
                  from_ref: str = "main") -> int:
    """New movable branch pointing at ``at`` (default: the resolved
    ``from_ref``).  Later ``write/upsert/delete(..., branch=name)``
    commits advance ONLY this branch; main never observes them."""
    if name == "main":
        raise ValueError("'main' always exists")
    snap = at if at is not None else resolve_ref(root, from_ref)
    if snap is None:
        raise FileNotFoundError(f"nothing to branch from at {root!r}")
    _load_manifest(root, snap)          # must exist
    _write_ref(root, name, snap, "heads")
    return snap


def create_tag(root: str, name: str, *, at: int | None = None,
               from_ref: str = "main") -> int:
    """Immutable named snapshot pointer; re-tagging an existing name
    raises (delete the file manually if you truly must)."""
    path = _ref_file(root, name, "tags")
    if os.path.exists(path):
        raise FileExistsError(f"tag {name!r} already exists")
    if name == "main" or os.path.exists(_ref_file(root, name, "heads")):
        raise FileExistsError(
            f"{name!r} is a branch; pick a distinct tag name")
    snap = at if at is not None else resolve_ref(root, from_ref)
    if snap is None:
        raise FileNotFoundError(f"nothing to tag at {root!r}")
    _load_manifest(root, snap)
    _write_ref(root, name, snap, "tags")
    return snap


def list_refs(root: str) -> dict:
    """{'main': id|None, 'branches': {name: id}, 'tags': {name: id}}."""
    out = {"main": _read_head(root), "branches": {}, "tags": {}}
    for kind, key in (("heads", "branches"), ("tags", "tags")):
        d = os.path.join(root, "refs", kind)
        try:
            names = sorted(os.listdir(d))
        except FileNotFoundError:
            continue
        for n in names:
            if n.endswith((".tmp",)) or ".tmp-" in n:
                continue
            try:
                with open(os.path.join(d, n)) as f:
                    out[key][n] = int(f.read().strip())
            except (ValueError, OSError):
                pass
    return out


def _load_manifest(root: str, snap_id: int) -> dict:
    with open(os.path.join(_manifest_dir(root),
                           f"snap-{snap_id:06d}.json")) as f:
        return json.load(f)


def _write_data_files(ds: "rd.Dataset", root: str,
                      stats_cols: tuple, contract,
                      bloom_cols: tuple = (),
                      bloom_bits_log2: int = 13) -> list[dict]:
    """Shared data-file writer for snapshot commits: one parquet file
    per non-empty block (ordinal+hash idempotent naming under a
    per-attempt commit token), per-file min/max stats for
    ``stats_cols``, and the validated-commit gate — when ``contract``
    is given, every block is checked in its write task and a single
    violation removes THIS attempt's files and raises before any
    manifest exists."""
    data_dir = os.path.join(root, "data")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(_manifest_dir(root), exist_ok=True)

    from ._blocksink import write_block_files

    # the commit token namespaces THIS write attempt's files: without
    # it, re-writing identical data produces identical names (same
    # ordinals, same content hash), os.replace silently no-ops onto a
    # COMMITTED snapshot's file, and the reject-cleanup below would
    # delete data that HEAD still references
    token = uuid.uuid4().hex[:8]

    def _encode(tab: pa.Table) -> pa.Buffer:
        buf_sink = pa.BufferOutputStream()
        pq.write_table(tab, buf_sink)
        return buf_sink.getvalue()

    def _entry(tab: pa.Table, name: str, buf) -> dict:
        n_viol = 0
        if contract is not None:
            n_viol = _cached_plan(contract).validate(tab).num_rows
        stats = {}
        for c in dict.fromkeys(stats_cols + tuple(bloom_cols)):
            if c in tab.column_names:
                s = _col_stats(tab, c)
                if s is not None:
                    stats[c] = s
                    if c in bloom_cols:
                        s["bloom"] = {
                            "bits_log2": bloom_bits_log2,
                            "b64": _bloom_build(tab[c], s["type"],
                                                bloom_bits_log2)}
        return {"path": os.path.join("data", name),
                "rows": int(tab.num_rows), "bytes": len(buf),
                "violations": int(n_viol), "stats": stats,
                "schema_fp": _schema_fp(tab.schema)}

    entries = write_block_files(ds, data_dir, encode=_encode,
                                ext="parquet", prefix="part",
                                token=token, entry=_entry)

    total_viol = sum(f["violations"] for f in entries)
    if contract is not None and total_viol:
        # the commit gate: violating data never becomes HEAD
        for f in entries:
            try:
                os.remove(os.path.join(root, f["path"]))
            except FileNotFoundError:
                pass
        raise ValueError(
            f"snapshot rejected: {total_viol} contract violations "
            f"across {sum(1 for f in entries if f['violations'])}"
            f"/{len(entries)} files; HEAD unchanged")
    return entries


def _commit_manifest(root: str, manifest: dict,
                     branch: str = "main") -> dict:
    """Atomically publish ``manifest`` and flip ``branch`` to it.

    The manifest file is created with O_EXCL and the id re-allocated
    on collision, so two concurrent writers (different branches of
    the same table) can never clobber each other's manifest — the
    loser simply lands on the next id."""
    snap_id = manifest["id"]
    payload = None
    while True:
        manifest["id"] = snap_id
        payload = json.dumps(manifest).encode()
        mpath = os.path.join(_manifest_dir(root),
                             f"snap-{snap_id:06d}.json")
        try:
            fd = os.open(mpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            snap_id += 1
            continue
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        break
    # the branch flips to the new snapshot in ONE rename
    _write_ref(root, branch, snap_id, "heads")
    return manifest


def write_snapshot(ds: "rd.Dataset", root: str, *,
                   stats_cols: tuple = (), mode: str = "overwrite",
                   contract=None, bloom_cols: tuple = (),
                   bloom_bits_log2: int = 13,
                   branch: str = "main") -> dict:
    """Write ``ds`` as a new snapshot of the table at ``root``;
    returns the manifest dict.  ``stats_cols`` are the columns whose
    per-file min/max land in the manifest (pick the prune keys —
    timestamps, partition-ish ids).  ``mode="append"`` includes the
    current HEAD snapshot's files; ``"overwrite"`` starts the file
    list fresh (older snapshots stay readable either way).  Blocks
    stream through the sink with backpressure; only the file ENTRIES
    (path + stats) gather on the driver for the manifest.

    ``contract`` (a :class:`~rayskema.schema.TableSchema`) turns the
    write into a VALIDATED COMMIT: every block is checked against the
    contract's column-scope constraints in the same task that writes
    it (one pass — no separate validation scan), and when any block
    violates, the data files are removed and ``HEAD`` never flips —
    readers can only ever observe contract-clean snapshots.  The
    manifest records the ``schema_hash``.  Table-scope rules
    (uniqueness, referential integrity) need the exchange and stay
    with the validate pipeline."""
    if mode not in ("overwrite", "append"):
        raise ValueError("mode must be 'overwrite' or 'append'")
    entries = _write_data_files(ds, root, tuple(stats_cols), contract,
                                bloom_cols=tuple(bloom_cols),
                                bloom_bits_log2=bloom_bits_log2)
    head = _read_ref(root, branch)
    if head is None and branch != "main":
        if os.path.exists(_ref_file(root, branch, "tags")):
            raise FileExistsError(
                f"{branch!r} is a tag; tags are immutable commit "
                "targets")
        raise FileNotFoundError(
            f"branch {branch!r} does not exist at {root!r}; create it "
            "with create_branch first (a typo would otherwise "
            "silently open a fresh branch)")
    files = list(entries)
    if mode == "append" and head is not None:
        files = _load_manifest(root, head)["files"] + files
    snap_id = _next_snap_id(root)
    manifest = {"id": snap_id, "parent": head,
                "mode": mode, "files": files,
                "rows": sum(f["rows"] for f in files),
                "stats_cols": list(stats_cols),
                "bloom_cols": list(bloom_cols),
                "bloom_bits_log2": bloom_bits_log2,
                "schema_hash": (contract.schema_hash()
                                if contract is not None else None)}
    return _commit_manifest(root, manifest, branch=branch)


def upsert_snapshot(updates: "rd.Dataset", root: str, key_col: str, *,
                    contract=None, branch: str = "main") -> dict:
    """Keyed MERGE (upsert) into the snapshot table at ``root``: rows
    of ``updates`` REPLACE current rows with the same ``key_col``
    value and INSERT otherwise, committing a new snapshot.

    Scale shape — only intersecting files rewrite: the update keys
    gather once (updates are the SMALL side of a merge — a CDC batch,
    not the table), and every HEAD file whose manifest ``key_col``
    min/max range provably excludes all update keys is CARRIED BY
    REFERENCE into the new manifest, its bytes never read or moved.
    Files that may intersect are re-read, anti-filtered on the
    broadcast key set (vectorized ``is_in``), unioned with the
    updates, and rewritten through the validated-commit path (the
    same contract gate as :func:`write_snapshot`; rejection leaves
    HEAD unchanged).  Cluster the table on ``key_col`` at ingest
    (sort / Z-order) to make the prune bite.

    Stats for ``key_col`` (and the table's existing ``stats_cols``)
    are recomputed for the rewritten files.  Returns the new
    manifest, which also records ``files_carried``/``files_rewritten``.
    """
    import numpy as np

    import ray

    head = _read_ref(root, branch)
    if head is None:
        raise FileNotFoundError(f"no HEAD at {root!r} — write a "
                                "snapshot before upserting")
    manifest = _load_manifest(root, head)
    stats_cols = tuple(manifest.get("stats_cols") or ())
    bloom_cols = tuple(manifest.get("bloom_cols") or ())
    bloom_bits = manifest.get("bloom_bits_log2") or 13
    if key_col not in stats_cols:
        stats_cols = stats_cols + (key_col,)

    # distinct update keys, driver-held: the CDC-batch contract (the
    # TABLE never gathers; only the update key column does)
    upd = updates.materialize()
    key_chunks = [t[key_col] for t in ray.get(upd.to_arrow_refs())
                  if t.num_rows]
    if not key_chunks:
        return manifest          # empty update: no-op, HEAD stays
    keys = pa.chunked_array(key_chunks).combine_chunks().unique()
    if keys.null_count:
        raise ValueError("upsert_snapshot: null update keys")
    keys_np = np.sort(keys.to_numpy(zero_copy_only=False))

    def _may_intersect(f: dict) -> bool:
        s = (f.get("stats") or {}).get(key_col)
        if not s or s.get("min") is None:
            return True          # no stats: conservatively rewrite
        lo = np.searchsorted(keys_np, s["min"], side="left")
        return lo < len(keys_np) and keys_np[lo] <= s["max"]

    touched = [f for f in manifest["files"] if _may_intersect(f)]
    carried = [f for f in manifest["files"] if not _may_intersect(f)]

    key_set = pa.array(keys_np)

    def _drop_updated(tab: pa.Table) -> pa.Table:
        return tab.filter(pc.invert(pc.is_in(
            pc.cast(tab[key_col], key_set.type), value_set=key_set)))

    if touched:
        old = rd.read_parquet(
            [os.path.join(root, f["path"]) for f in touched])
        combined = old.map_batches(
            _drop_updated, batch_format="pyarrow").union(upd)
    else:
        combined = upd
    new_entries = _write_data_files(combined, root, stats_cols,
                                    contract, bloom_cols=bloom_cols,
                                    bloom_bits_log2=bloom_bits)

    files = carried + new_entries
    new_manifest = {
        "id": _next_snap_id(root), "parent": head, "mode": "upsert",
        "files": files, "rows": sum(f["rows"] for f in files),
        "stats_cols": list(stats_cols),
        "bloom_cols": list(bloom_cols),
        "bloom_bits_log2": bloom_bits,
        "schema_hash": (contract.schema_hash()
                        if contract is not None
                        else manifest.get("schema_hash")),
        "files_carried": len(carried),
        "files_rewritten": len(touched)}
    return _commit_manifest(root, new_manifest, branch=branch)


def delete_snapshot(root: str, filter: list[tuple], *,
                    contract=None, branch: str = "main") -> dict:
    """Predicate DELETE from the snapshot table at ``root``: rows
    satisfying ALL ``(col, op, literal)`` conjuncts (op in
    ``== < <= > >=``; SQL semantics — a null comparison never
    deletes) are removed in a new snapshot commit.

    Three-way file triage from the manifest stats, so data moves only
    where the predicate actually bites:

    - files whose stats PROVE no row matches **carry by reference**
      (bytes never read);
    - files whose stats prove EVERY row matches (no nulls, whole
      [min, max] inside the predicate region) **drop entirely** —
      also no read;
    - only genuinely straddling files **rewrite**, streaming through
      the validated-commit path with the inverted predicate.

    Returns the new manifest (records ``files_carried`` /
    ``files_dropped`` / ``files_rewritten``); an empty-effect delete
    (every file carried) still commits a snapshot for lineage.
    """
    if not filter:
        raise ValueError("delete_snapshot: empty predicate would "
                         "delete nothing — pass conjuncts")
    for col, op, lit in filter:
        if op not in _OPS:
            raise ValueError(f"op must be one of {_OPS}")
    head = _read_ref(root, branch)
    if head is None:
        raise FileNotFoundError(f"no HEAD at {root!r}")
    manifest = _load_manifest(root, head)
    stats_cols = tuple(manifest.get("stats_cols") or ())
    bloom_cols = tuple(manifest.get("bloom_cols") or ())
    bloom_bits = manifest.get("bloom_bits_log2") or 13

    carried, dropped, rewrite = [], [], []
    for f in manifest["files"]:
        stats = f.get("stats") or {}
        if not all(_file_may_match(stats, c, o, v)
                   and (o != "==" or _bloom_may_contain(
                       stats.get(c) or {}, v))
                   for c, o, v in filter):
            carried.append(f)
        elif all(_file_all_match(stats, c, o, v)
                 for c, o, v in filter):
            dropped.append(f)
        else:
            rewrite.append(f)

    def _keep(tab: pa.Table) -> pa.Table:
        mask = None
        for col, op, lit in filter:
            c = tab[col]
            lit_s = pa.scalar(lit, type=c.type) \
                if not isinstance(lit, pa.Scalar) else lit
            term = {"==": pc.equal, "<": pc.less,
                    "<=": pc.less_equal, ">": pc.greater,
                    ">=": pc.greater_equal}[op](c, lit_s)
            mask = term if mask is None else pc.and_(mask, term)
        # null predicate -> not deleted (SQL DELETE WHERE semantics)
        return tab.filter(pc.fill_null(pc.invert(mask), True))

    new_entries = []
    if rewrite:
        survivors = rd.read_parquet(
            [os.path.join(root, f["path"]) for f in rewrite]
        ).map_batches(_keep, batch_format="pyarrow")
        new_entries = _write_data_files(survivors, root, stats_cols,
                                        contract,
                                        bloom_cols=bloom_cols,
                                        bloom_bits_log2=bloom_bits)

    files = carried + new_entries
    new_manifest = {
        "id": _next_snap_id(root), "parent": head, "mode": "delete",
        "files": files, "rows": sum(f["rows"] for f in files),
        "stats_cols": list(stats_cols),
        "bloom_cols": list(bloom_cols),
        "bloom_bits_log2": bloom_bits,
        "schema_hash": manifest.get("schema_hash"),
        "files_carried": len(carried),
        "files_dropped": len(dropped),
        "files_rewritten": len(rewrite)}
    return _commit_manifest(root, new_manifest, branch=branch)


def read_snapshot(root: str, *, columns: list[str] | None = None,
                  snapshot: int | None = None,
                  filter: list[tuple] | None = None,
                  ref: str = "main") -> "rd.Dataset":
    """Read a snapshot (HEAD by default, or a historical id).
    ``filter`` is a list of ``(col, op, literal)`` conjuncts with op
    in ``== < <= > >=``: files the manifest stats prove irrelevant are
    never opened, and the same conjunction is pushed into the Parquet
    read (row-group pruning).  Returns an empty-schema'd Dataset when
    everything prunes."""
    snap_id = snapshot if snapshot is not None \
        else resolve_ref(root, ref)
    if snap_id is None:
        raise FileNotFoundError(f"no ref {ref!r} at {root!r}")
    manifest = _load_manifest(root, snap_id)
    files = manifest["files"]
    if filter:
        for col, op, lit in filter:
            if op not in _OPS:
                raise ValueError(f"op must be one of {_OPS}")
        files = [f for f in files
                 if all(_file_may_match(f["stats"], col, op, lit)
                        and (op != "==" or _bloom_may_contain(
                            (f["stats"] or {}).get(col) or {}, lit))
                        for col, op, lit in filter)]
    paths = [os.path.join(root, f["path"]) for f in files]
    if not paths:
        # keep the schema: read zero rows of one real file
        any_file = (manifest["files"][0]["path"]
                    if manifest["files"] else None)
        if any_file is None:
            return rd.from_arrow(pa.table({}))
        sch = pq.read_schema(os.path.join(root, any_file))
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        return rd.from_arrow(sch.empty_table())
    expr = None
    if filter:
        for col, op, lit in filter:
            f_ = pc.field(col)
            lit = pa.scalar(lit) if not isinstance(lit, pa.Scalar) else lit
            term = {"==": f_ == lit, "<": f_ < lit, "<=": f_ <= lit,
                    ">": f_ > lit, ">=": f_ >= lit}[op]
            expr = term if expr is None else expr & term
    # add-column evolution: with MIXED file schemas in one snapshot
    # (an append introduced a column), Ray's read would silently keep
    # only the FIRST file's columns.  The manifest schema_fp detects
    # the mix without touching data; one footer read per DISTINCT
    # schema builds the unified schema, each schema group reads
    # separately and pads to it (absent columns surface as nulls),
    # and the groups union.  Conflicting types fail loudly in
    # unify_schemas.
    groups: dict = {}
    for f, p in zip(files, paths):
        groups.setdefault(f.get("schema_fp") or p, []).append(p)
    if len(groups) > 1:
        schemas = {g: pq.read_schema(ps[0])
                   for g, ps in groups.items()}
        unified = pa.unify_schemas(list(schemas.values()),
                                   promote_options="permissive")
        if columns is not None:
            unified = pa.schema([unified.field(c) for c in columns])

        def _pad_to(target: pa.Schema):
            def fn(tab: pa.Table) -> pa.Table:
                out = {}
                for fld in target:
                    if fld.name in tab.column_names:
                        out[fld.name] = pc.cast(tab[fld.name],
                                                fld.type)
                    else:
                        out[fld.name] = pa.nulls(tab.num_rows,
                                                 type=fld.type)
                return pa.table(out)
            return fn

        def _mask(conjuncts):
            def fn(tab: pa.Table) -> pa.Table:
                mask = None
                for col, op, lit in conjuncts:
                    c = tab[col]
                    lit_s = (pa.scalar(lit, type=c.type)
                             if not isinstance(lit, pa.Scalar)
                             else lit)
                    term = {"==": pc.equal, "<": pc.less,
                            "<=": pc.less_equal, ">": pc.greater,
                            ">=": pc.greater_equal}[op](c, lit_s)
                    mask = (term if mask is None
                            else pc.and_(mask, term))
                return tab.filter(pc.fill_null(mask, False))
            return fn

        parts = []
        for g, ps in groups.items():
            names = set(schemas[g].names)
            want = [c for c in unified.names if c in names]
            # a projection may exclude every physical column of an
            # old file; read one real column to carry the row count
            read_cols = want or [schemas[g].names[0]]
            sub = rd.read_parquet(ps, columns=read_cols)
            sub = sub.map_batches(_pad_to(unified),
                                  batch_format="pyarrow")
            if filter:
                # filter columns may be padded nulls here, so the
                # predicate applies AFTER padding (null -> drop, SQL
                # semantics); row-group pushdown stays on the
                # single-schema path by design
                sub = sub.map_batches(_mask(filter),
                                      batch_format="pyarrow")
            parts.append(sub)
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out
    return rd.read_parquet(paths, columns=columns, filter=expr)


def snapshot_history(root: str) -> list[dict]:
    """All snapshots oldest-first: (id, parent, mode, rows, files)."""
    out = []
    mdir = _manifest_dir(root)
    # a writer killed mid-publish leaves snap-*.json.tmp-<uuid>
    # siblings; the table is consistent (HEAD never flipped), so
    # history must skip them
    for name in sorted(n for n in os.listdir(mdir)
                       if re.fullmatch(r"snap-\d{6}\.json", n)):
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        out.append({"id": m["id"], "parent": m["parent"],
                    "mode": m["mode"], "rows": m["rows"],
                    "files": len(m["files"])})
    return out


def compact_snapshot(root: str, *, target_rows: int = 1_000_000,
                     order_by: str | None = None,
                     stats_cols: tuple | None = None,
                     branch: str = "main") -> dict:
    """Small-file compaction: rewrite HEAD's files into
    ``ceil(rows / target_rows)`` files as a NEW snapshot (history
    stays readable — compaction is just another snapshot whose parent
    is the fragmented one).  ``order_by`` re-clusters during the
    rewrite (a ts/Z-order sort makes the per-file stats ranges
    disjoint, which is what makes manifest pruning bite); by default
    the existing order is kept.  ``stats_cols`` defaults to the
    manifest's existing choice.

    An append-heavy table accumulates one file per written block;
    at 10^5 files the read-task launch overhead dominates scans —
    compaction is the standing maintenance op (public Iceberg/Delta
    ``rewrite_data_files`` / ``OPTIMIZE`` concept)."""
    head = _read_ref(root, branch)
    if head is None:
        raise FileNotFoundError(f"no HEAD at {root!r}")
    manifest = _load_manifest(root, head)
    if stats_cols is None:
        stats_cols = tuple(manifest.get("stats_cols", ()))
    ds = read_snapshot(root, snapshot=head)
    if order_by is not None:
        ds = ds.sort(order_by)
    rows = manifest["rows"]
    n_files = max(1, -(-rows // max(1, target_rows)))
    ds = ds.repartition(n_files)
    return write_snapshot(ds, root, stats_cols=stats_cols,
                          mode="overwrite", branch=branch)


def snapshot_changes(root: str, *, from_snapshot: int,
                     to_snapshot: int | None = None,
                     key_cols: tuple = (), compare_cols: tuple = (),
                     buckets: int | None = None) -> "rd.Dataset":
    """CDC between two snapshots of the same table: ``(key...,
    change)`` rows with change ∈ {added, removed, changed} — the
    incremental-consumption primitive (what changed since the
    snapshot I last processed?).

    The manifest makes this cheap: data files are immutable, so every
    file PRESENT IN BOTH snapshots is skipped without opening it —
    only the symmetric difference of the file lists is read.  For an
    append-only history that is exactly the new files (constant work
    in table size); after a compaction the rewritten files re-read but
    identical rows cancel in the keyed diff.  Keys must be unique per
    snapshot across the DIFFED files (the validate pipeline's
    uniqueness rule is the upstream guarantee)."""
    from ..pipelines.relational import diff_snapshots

    key_cols, compare_cols = list(key_cols), list(compare_cols)
    if not key_cols:
        raise ValueError("key_cols is required")
    to_id = to_snapshot if to_snapshot is not None else _read_head(root)
    a = _load_manifest(root, from_snapshot)
    b = _load_manifest(root, to_id)
    a_paths = {f["path"] for f in a["files"]}
    b_paths = {f["path"] for f in b["files"]}
    cols = key_cols + compare_cols

    def _read(paths: list[str]) -> "rd.Dataset":
        return rd.read_parquet([os.path.join(root, p) for p in paths],
                               columns=cols)

    old_only = sorted(a_paths - b_paths)
    new_only = sorted(b_paths - a_paths)

    def _const(paths: list[str], change: str) -> "rd.Dataset":
        def _f(tab: pa.Table) -> pa.Table:
            out = {c: tab[c] for c in key_cols}
            out["change"] = pa.array(
                [change] * tab.num_rows, pa.string())
            return pa.table(out)
        return _read(paths).map_batches(_f, batch_format="pyarrow")

    if not old_only and not new_only:
        sch = pa.schema(
            [pa.field(c, pa.int64()) for c in key_cols]
            + [pa.field("change", pa.string())])
        if a["files"]:
            fsch = pq.read_schema(
                os.path.join(root, a["files"][0]["path"]))
            sch = pa.schema([fsch.field(c) for c in key_cols]
                            + [pa.field("change", pa.string())])
        return rd.from_arrow(sch.empty_table())
    if not old_only:
        return _const(new_only, "added")      # append-only fast path
    if not new_only:
        return _const(old_only, "removed")
    return diff_snapshots(_read(old_only), _read(new_only),
                          key_cols, compare_cols, buckets=buckets)
