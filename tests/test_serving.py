"""Serving seam: single-record validation, the AdmissionReview adapter
and the WSGI surface (reference middleware/middleware.go:14-37 and
examples/k8s_webhook_poc/main.go:128-260)."""
import io
import json

import pytest

from rayskema.serving import (
    AdmissionWebhook, DuplicateKeyError, ParseLimits, RecordValidator,
    error_payload, loads_strict, make_wsgi_app,
)
from rayskema.contract_openapi import import_openapi


CRD = """
apiVersion: apiextensions.k8s.io/v1
kind: CustomResourceDefinition
metadata:
  name: widgets.example.io
spec:
  group: example.io
  names:
    kind: Widget
    plural: widgets
  versions:
    - name: v1
      served: true
      schema:
        openAPIV3Schema:
          type: object
          additionalProperties: false
          required: [id]
          properties:
            id:
              type: integer
              minimum: 0
            name:
              type: string
              pattern: "^[a-z]+$"
"""


def _review(obj, *, uid="u-1", kind="Widget", gvr=None):
    return {
        "apiVersion": "admission.k8s.io/v1", "kind": "AdmissionReview",
        "request": {
            "uid": uid,
            "kind": {"group": "example.io", "version": "v1", "kind": kind},
            "resource": gvr or {"group": "example.io", "version": "v1",
                                "resource": "widgets"},
            "operation": "CREATE",
            "object": obj,
        },
    }


# ---------------------------------------------------------------- parse


def test_loads_strict_duplicate_key():
    with pytest.raises(DuplicateKeyError):
        loads_strict('{"a": 1, "a": 2}')
    # policy "last" keeps the final value (json.loads default)
    assert loads_strict('{"a": 1, "a": 2}',
                        ParseLimits(on_duplicate_key="last")) == {"a": 2}
    # nested duplicate caught too
    with pytest.raises(DuplicateKeyError):
        loads_strict('{"o": {"x": 1, "x": 2}}')


def test_loads_strict_byte_and_depth_caps():
    with pytest.raises(ValueError, match="exceeds cap"):
        loads_strict(b'{"a": "' + b"x" * 100 + b'"}',
                     ParseLimits(max_bytes=50))
    deep = '{"a":' * 20 + "1" + "}" * 20
    with pytest.raises(ValueError, match="max_depth"):
        loads_strict(deep, ParseLimits(max_depth=10))
    assert loads_strict(deep, ParseLimits(max_depth=64))


def test_error_payload_shape():
    issues = [{"path": "/id", "code": "required", "rule": "", "message": "m",
               "params": ""}]
    assert error_payload(issues) == {"issues": issues}


# ------------------------------------------------------- RecordValidator


@pytest.fixture(scope="module")
def widget_schema():
    schema, diag = import_openapi(CRD, name="Widget")
    return schema


def test_record_validator_valid(widget_schema):
    v = RecordValidator(widget_schema)
    assert v.validate({"id": 3, "name": "abc"}) == []
    assert v.is_valid({"id": 0})  # name optional


def test_record_validator_issues(widget_schema):
    v = RecordValidator(widget_schema)
    issues = v.validate({"name": "ABC", "extra": 1})
    codes = {i["code"] for i in issues}
    assert "required" in codes      # id missing
    assert "pattern" in codes       # name uppercase
    assert "unknown_key" in codes   # additionalProperties: false
    # each issue carries the 5 violation columns, all strings
    for i in issues:
        assert set(i) == {"path", "code", "rule", "message", "params"}
        assert all(isinstance(x, str) for x in i.values())
    # deterministic order: re-run identical
    assert issues == v.validate({"name": "ABC", "extra": 1})


def test_record_validator_range(widget_schema):
    v = RecordValidator(widget_schema)
    issues = v.validate({"id": -1})
    assert issues and any("/id" in i["path"] for i in issues)


# ------------------------------------------------------ AdmissionWebhook


@pytest.fixture(scope="module")
def webhook():
    return AdmissionWebhook(CRD)


def test_webhook_expected_gvr(webhook):
    assert webhook.expected == {"kind": "Widget", "group": "example.io",
                                "version": "v1", "resource": "widgets"}


def test_webhook_allow(webhook):
    out = webhook.review(_review({"id": 7, "name": "ok"}))
    assert out["kind"] == "AdmissionReview"
    resp = out["response"]
    assert resp["uid"] == "u-1" and resp["allowed"] is True
    assert "id" in resp["auditAnnotations"]["rayskema/presence"]


def test_webhook_deny_with_issues(webhook):
    out = webhook.review(_review({"name": "BAD"}))
    resp = out["response"]
    assert resp["allowed"] is False
    assert resp["status"]["code"] == 422
    assert "issue(s)" in resp["status"]["message"]
    assert 1 <= len(resp["warnings"]) <= 5
    compact = json.loads(resp["auditAnnotations"]["rayskema/issues"])
    assert {"path", "code"} == set(compact[0])


def test_webhook_kind_and_gvr_mismatch(webhook):
    out = webhook.review(_review({"id": 1}, kind="Gadget"))
    assert out["response"]["allowed"] is False
    assert "kind mismatch" in out["response"]["status"]["message"]
    out = webhook.review(_review(
        {"id": 1}, gvr={"group": "other.io", "version": "v1",
                        "resource": "widgets"}))
    assert "resource mismatch" in out["response"]["status"]["message"]


def test_webhook_missing_request_and_raw_object(webhook):
    out = webhook.review({})
    assert out["response"]["status"]["code"] == 400
    # raw JSON string object with a duplicate key -> strict-parse denial
    out = webhook.review(_review('{"id": 1, "id": 2}'))
    assert out["response"]["allowed"] is False
    assert "duplicate" in out["response"]["status"]["message"]


# --------------------------------------------------------------- WSGI


def _call(app, method, path, body=b"", ctype="application/json"):
    status_headers = {}

    def start_response(status, headers):
        status_headers["status"] = status
        status_headers["headers"] = dict(headers)

    environ = {
        "REQUEST_METHOD": method, "PATH_INFO": path,
        "CONTENT_TYPE": ctype, "CONTENT_LENGTH": str(len(body)),
        "wsgi.input": io.BytesIO(body),
    }
    chunks = app(environ, start_response)
    return status_headers["status"], b"".join(chunks)


def test_wsgi_routes(webhook):
    app = make_wsgi_app(webhook)
    status, body = _call(app, "GET", "/healthz")
    assert status.startswith("200") and body == b"ok"
    status, _ = _call(app, "GET", "/nope")
    assert status.startswith("404")
    status, _ = _call(app, "GET", "/validate")
    assert status.startswith("405")
    status, _ = _call(app, "POST", "/validate", b"{}", ctype="text/plain")
    assert status.startswith("415")
    status, _ = _call(app, "POST", "/validate", b"not json")
    assert status.startswith("400")


def test_wsgi_validate_roundtrip(webhook):
    app = make_wsgi_app(webhook)
    body = json.dumps(_review({"id": 5, "name": "fine"})).encode()
    status, out = _call(app, "POST", "/validate", body)
    assert status.startswith("200")
    resp = json.loads(out)["response"]
    assert resp["allowed"] is True and resp["uid"] == "u-1"
    # a denial is still HTTP 200 with allowed=false (admission contract)
    body = json.dumps(_review({"name": "NO"})).encode()
    status, out = _call(app, "POST", "/validate", body)
    assert status.startswith("200")
    assert json.loads(out)["response"]["allowed"] is False


def test_cli_serve_check_only(tmp_path, capsys):
    from rayskema.__main__ import main
    crd_path = tmp_path / "crd.yaml"
    crd_path.write_text(CRD)
    rc = main(["serve", "--crd", str(crd_path), "--check-only"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["expected"]["kind"] == "Widget"
    assert out["expected"]["resource"] == "widgets"


def test_loads_strict_recursion_bomb_is_bounded_error(webhook):
    # nesting past Python's recursion limit must surface as the
    # contractual ValueError (HTTP 400), never a RecursionError 500
    bomb = "[" * 20000 + "]" * 20000
    with pytest.raises(ValueError, match="max_depth"):
        loads_strict(bomb)
    app = make_wsgi_app(webhook)
    status, _ = _call(app, "POST", "/validate", bomb.encode())
    assert status.startswith("400")
