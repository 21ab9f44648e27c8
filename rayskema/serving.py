"""Single-record serving seam: validate ONE JSON document — or a
Kubernetes AdmissionReview — against a compiled plan, without Ray.

Reference parity: ``middleware/middleware.go:14-37`` (recommended HTTP
parse options, ``ErrorPayload`` shaping) and
``examples/k8s_webhook_poc/main.go:128-260`` (AdmissionReview v1
handler: GVK/GVR pre-checks, 422 denial carrying an issue summary,
warnings = first five issue summaries, audit annotations with the
compact issue list and a presence summary).

The batch engine validates datasets; a webhook validates one object
per request.  :class:`RecordValidator` reuses the SAME compiled
:class:`~rayskema.plan.ConstraintPlan` on a one-row Arrow table, so a
rule behaves identically at 100 TB and at admission time — no second
implementation to drift.  The plan compiles once per process (the
actor-``__init__`` pattern applied to a server worker); per-request
work is one ``from_pylist`` + one vectorized validate.

Nothing here imports Ray: the module is safe to load inside a thin
WSGI worker.
"""
from __future__ import annotations

import json
from typing import Any, Callable, Mapping, Sequence

import pyarrow as pa

from .issues import VIOLATION_COLS, sort_violations
from .plan import ConstraintPlan
from .schema import TableSchema

__all__ = [
    "ParseLimits", "DuplicateKeyError", "loads_strict", "error_payload",
    "RecordValidator", "AdmissionWebhook", "make_wsgi_app",
]


class ParseLimits:
    """DoS bounds for the HTTP JSON boundary (the reference's
    recommended ``ParseOpt``: duplicate keys are errors, depth and
    byte caps; ``middleware.go:25-33`` and the webhook handler's
    ``MaxDepth: 256, MaxBytes: 10MiB``)."""

    def __init__(self, max_bytes: int = 10 << 20, max_depth: int = 256,
                 on_duplicate_key: str = "error"):
        if on_duplicate_key not in ("error", "last"):
            raise ValueError("on_duplicate_key must be 'error' or 'last'")
        self.max_bytes = max_bytes
        self.max_depth = max_depth
        self.on_duplicate_key = on_duplicate_key


class DuplicateKeyError(ValueError):
    """A JSON object repeated a key and the limits say that's fatal."""

    def __init__(self, key: str):
        super().__init__(f"duplicate object key: {key!r}")
        self.key = key


def loads_strict(data: bytes | str, limits: ParseLimits | None = None) -> Any:
    """``json.loads`` under :class:`ParseLimits`: byte cap before the
    parse, duplicate-key policy via ``object_pairs_hook``, depth cap
    after (Python's recursive parser raises RecursionError long before
    256 anyway; the explicit walk keeps the bound contractual)."""
    limits = limits or ParseLimits()
    raw = data.encode("utf-8") if isinstance(data, str) else data
    if len(raw) > limits.max_bytes:
        raise ValueError(
            f"payload {len(raw)} bytes exceeds cap {limits.max_bytes}")

    def hook(pairs):
        if limits.on_duplicate_key == "error":
            seen = set()
            for k, _ in pairs:
                if k in seen:
                    raise DuplicateKeyError(k)
                seen.add(k)
        return dict(pairs)

    try:
        obj = json.loads(raw, object_pairs_hook=hook)
    except RecursionError:
        # json.loads recurses before our explicit depth walk can run;
        # convert to the contractual bounded error so WSGI handlers
        # answer 400, not a 500 traceback
        raise ValueError(
            f"JSON nesting exceeds max_depth {limits.max_depth}") \
            from None
    _check_depth(obj, limits.max_depth)
    return obj


def _check_depth(obj: Any, max_depth: int) -> None:
    # iterative DFS: the whole point is not trusting recursion depth
    stack = [(obj, 1)]
    while stack:
        node, d = stack.pop()
        if d > max_depth:
            raise ValueError(f"JSON nesting exceeds max_depth {max_depth}")
        if isinstance(node, dict):
            stack.extend((v, d + 1) for v in node.values())
        elif isinstance(node, (list, tuple)):
            stack.extend((v, d + 1) for v in node)


def error_payload(issues: Sequence[Mapping[str, str]]) -> dict:
    """Shape issues for a JSON error response
    (``middleware.go:35-37``)."""
    return {"issues": [dict(i) for i in issues]}


class RecordValidator:
    """Validate single JSON objects with the batch engine's compiled
    plan.  Construct once (plan compile), call per request.

    ``validate(obj)`` returns a deterministically ordered list of
    issue dicts ``{path, code, rule, message, params}`` — the same
    five violation columns the dataset pipeline emits
    (``issues.py`` VIOLATION_COLS), minus key columns (a single
    record's keys are whatever the object carries)."""

    def __init__(self, schema: TableSchema, *, max_issues: int | None = None):
        self.schema = schema
        self.plan = ConstraintPlan(schema, max_issues=max_issues)
        self._key_cols = [f.name for f in schema.key_fields()]

    def _to_table(self, obj: Mapping[str, Any]) -> pa.Table:
        if not isinstance(obj, Mapping):
            raise TypeError("record must be a JSON object (mapping)")
        # one-row reconcile, same policy as sources/jsonl.py
        # reconcile_to_schema: missing -> null, declared dtype cast
        # best-effort (failures left for the plan's checked-cast
        # reporting), unknown keys kept for the unknown policy
        out: dict[str, pa.Array] = {}
        for col in self.schema.columns:
            if col.name in obj:
                try:
                    arr = pa.array([obj[col.name]], type=col.dtype)
                except (pa.ArrowInvalid, pa.ArrowTypeError,
                        pa.ArrowNotImplementedError, OverflowError):
                    arr = pa.array([obj[col.name]])
            else:
                arr = pa.nulls(1, type=col.dtype)
            out[col.name] = arr
        for name, val in obj.items():
            if name not in out:
                try:
                    out[name] = pa.array([val])
                except (pa.ArrowInvalid, pa.ArrowTypeError):
                    out[name] = pa.array([json.dumps(val)])
        return pa.table(out)

    def validate(self, obj: Mapping[str, Any]) -> list[dict[str, str]]:
        viols = self.plan.validate(self._to_table(obj))
        key_cols = [c for c in self._key_cols if c in viols.column_names]
        viols = sort_violations(viols, key_cols)
        cols = {c: viols[c].to_pylist() for c in VIOLATION_COLS}
        return [
            {c: cols[c][i] or "" for c in VIOLATION_COLS}
            for i in range(viols.num_rows)
        ]

    def is_valid(self, obj: Mapping[str, Any]) -> bool:
        return not self.validate(obj)


def _summarize(issues: list[dict[str, str]], n: int = 5) -> str:
    # the reference's summarizeIssues: "<count> issue(s): p1: msg1; ..."
    parts = [f"{i['path'] or '/'}: {i['code']}"
             + (f" ({i['message']})" if i["message"] else "")
             for i in issues[:n]]
    more = f"; +{len(issues) - n} more" if len(issues) > n else ""
    return f"{len(issues)} issue(s): " + "; ".join(parts) + more


def _compact(issues: list[dict[str, str]]) -> str:
    return json.dumps(
        [{"path": i["path"], "code": i["code"]} for i in issues],
        separators=(",", ":"))


class AdmissionWebhook:
    """Kubernetes ValidatingAdmissionWebhook adapter
    (``examples/k8s_webhook_poc/main.go:128-260``).

    Construct from a CRD manifest (YAML/JSON bytes or dict): imports
    the ``openAPIV3Schema`` via :func:`~rayskema.contract_openapi.
    import_openapi` (embedded checks on — an admission webhook is the
    place they matter), derives the expected GVK/GVR from the CRD, and
    compiles the plan once.  ``review(ar)`` takes a decoded
    AdmissionReview v1 dict and returns the response AdmissionReview
    dict; it never raises on a bad request — it answers with
    ``allowed: false`` and a 4xx-coded status, exactly like the
    reference handler."""

    def __init__(self, crd_doc: dict | bytes | str, *,
                 kind: str | None = None,
                 limits: ParseLimits | None = None,
                 enable_embedded_checks: bool = True):
        from .contract_openapi import import_openapi
        if isinstance(crd_doc, (bytes, str)):
            try:
                crd_doc = json.loads(crd_doc)
            except (json.JSONDecodeError, UnicodeDecodeError):
                import yaml
                text = crd_doc.decode("utf-8", errors="replace") \
                    if isinstance(crd_doc, bytes) else crd_doc
                crd_doc = yaml.safe_load(text)
        self.limits = limits or ParseLimits()
        self.expected = self._expected_gvr(crd_doc, kind)
        schema, self.diag = import_openapi(
            crd_doc, name=self.expected.get("kind") or "object",
            enable_embedded_checks=enable_embedded_checks)
        self.validator = RecordValidator(schema)

    @staticmethod
    def _expected_gvr(doc: Any, kind: str | None) -> dict[str, str]:
        # main.go parseExpectedGVRFromYAML: spec.group,
        # spec.names.{kind,plural}, first served version
        exp = {"kind": kind or "", "group": "", "version": "",
               "resource": ""}
        spec = doc.get("spec") if isinstance(doc, dict) else None
        if not isinstance(spec, dict):
            return exp
        exp["group"] = spec.get("group") or ""
        names = spec.get("names") or {}
        if isinstance(names, dict):
            exp["kind"] = kind or names.get("kind") or ""
            exp["resource"] = names.get("plural") or ""
        for v in spec.get("versions") or []:
            if isinstance(v, dict) and v.get("served", True):
                exp["version"] = v.get("name") or ""
                break
        return exp

    def _deny(self, uid: str, code: int, message: str,
              issues: list[dict[str, str]] | None = None) -> dict:
        resp: dict[str, Any] = {
            "uid": uid, "allowed": False,
            "status": {"code": code, "reason": "Invalid",
                       "message": message},
        }
        if issues:
            resp["warnings"] = [
                f"{i['path'] or '/'}: {i['code']}" for i in issues[:5]]
            resp["auditAnnotations"] = {
                "rayskema/issues": _compact(issues)}
        return self._wrap(resp)

    @staticmethod
    def _wrap(resp: dict) -> dict:
        return {"apiVersion": "admission.k8s.io/v1",
                "kind": "AdmissionReview", "response": resp}

    def review(self, ar: Mapping[str, Any]) -> dict:
        req = ar.get("request") if isinstance(ar, Mapping) else None
        if not isinstance(req, Mapping):
            return self._wrap({"uid": "", "allowed": False,
                               "status": {"code": 400, "reason": "BadRequest",
                                          "message": "missing request"}})
        uid = req.get("uid") or ""
        exp = self.expected
        gvk = req.get("kind") or {}
        if exp["kind"] and isinstance(gvk, Mapping) \
                and gvk.get("kind") != exp["kind"]:
            return self._deny(uid, 422,
                              f"kind mismatch: expected {exp['kind']}, "
                              f"got {gvk.get('kind')}")
        gvr = req.get("resource") or {}
        if exp["group"] and exp["version"] and exp["resource"] \
                and isinstance(gvr, Mapping):
            if (gvr.get("group") != exp["group"]
                    or gvr.get("version") != exp["version"]
                    or gvr.get("resource") != exp["resource"]):
                return self._deny(
                    uid, 422,
                    "resource mismatch: expected "
                    f"group={exp['group']}, version={exp['version']}, "
                    f"resource={exp['resource']}; got "
                    f"group={gvr.get('group')}, "
                    f"version={gvr.get('version')}, "
                    f"resource={gvr.get('resource')}")
        obj = req.get("object")
        if isinstance(obj, (bytes, str)):
            try:
                obj = loads_strict(obj, self.limits)
            except (ValueError, DuplicateKeyError) as ex:
                return self._deny(uid, 422, str(ex))
        if not isinstance(obj, Mapping):
            return self._deny(uid, 422, "request.object is not an object")
        issues = self.validator.validate(obj)
        if issues:
            return self._deny(uid, 422, _summarize(issues), issues)
        present = sorted(
            c.name for c in self.validator.schema.columns if c.name in obj)
        return self._wrap({
            "uid": uid, "allowed": True,
            "auditAnnotations": {
                "rayskema/presence": ",".join(present)},
        })


def make_wsgi_app(webhook: AdmissionWebhook) -> Callable:
    """Stdlib WSGI app exposing ``/healthz`` and ``/validate``
    (``main.go:100-126`` route + hardening parity: POST-only,
    ``application/json`` content type, body size cap from the
    webhook's :class:`ParseLimits`).  Serve it with
    ``wsgiref.simple_server`` or any WSGI server; in-process tests
    drive it with a plain environ dict — no sockets needed."""

    def app(environ, start_response):
        path = environ.get("PATH_INFO", "/")
        method = environ.get("REQUEST_METHOD", "GET")

        def reply(code_line: str, payload: dict | bytes,
                  ctype: str = "application/json"):
            body = payload if isinstance(payload, bytes) \
                else json.dumps(payload).encode()
            start_response(code_line, [
                ("Content-Type", ctype),
                ("Content-Length", str(len(body)))])
            return [body]

        if path == "/healthz":
            return reply("200 OK", b"ok", "text/plain")
        if path != "/validate":
            return reply("404 Not Found", {"error": "not found"})
        if method != "POST":
            return reply("405 Method Not Allowed",
                         {"error": "POST required"})
        ctype = environ.get("CONTENT_TYPE", "")
        if ctype and not ctype.startswith("application/json"):
            return reply("415 Unsupported Media Type",
                         {"error": "unsupported Content-Type"})
        try:
            length = int(environ.get("CONTENT_LENGTH") or 0)
        except ValueError:
            length = 0
        if length > webhook.limits.max_bytes:
            return reply("413 Payload Too Large",
                         {"error": "payload too large"})
        body = environ["wsgi.input"].read(length) if length else b""
        try:
            ar = loads_strict(body, webhook.limits)
        except (ValueError, DuplicateKeyError) as ex:
            return reply("400 Bad Request",
                         {"error": f"invalid AdmissionReview: {ex}"})
        try:
            out = webhook.review(ar)
        except Exception:  # panic guard, main.go:130-137
            return reply("500 Internal Server Error",
                         {"error": "internal error"})
        return reply("200 OK", out)

    return app
