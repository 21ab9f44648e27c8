"""Localized violation messages (reference i18n/translator.go:61-83).

Codes are the machine contract (never localized); ``render`` rewrites
only the human-facing ``message`` column of a violations table from a
per-locale catalog, vectorized via dictionary lookup on the code
column.  Report-time only — the validation pipeline itself never
depends on message text (determinism contract lives in
path/code/rule/params)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_CATALOG: dict[str, dict[str, str]] = {
    "en": {},  # empty => keep engine-emitted messages
    "ja": {
        "invalid_type": "型が不正です",
        "required": "必須項目です",
        "unknown_key": "未知のキーです",
        "duplicate_key": "キーが重複しています",
        "too_small": "値が小さすぎます",
        "too_big": "値が大きすぎます",
        "too_short": "短すぎます",
        "too_long": "長すぎます",
        "pattern": "パターンに一致しません",
        "invalid_enum": "列挙値ではありません",
        "invalid_format": "形式が不正です",
        "discriminator_missing": "判別子がありません",
        "discriminator_unknown": "未知の判別子です",
        "parse_error": "解析エラー",
        "overflow": "オーバーフロー",
        "truncated": "切り詰められました",
        "aggregate_violation": "集約制約違反",
        "uniqueness": "一意性違反",
        "business_rule": "業務ルール違反",
        "conflict": "整合性違反",
        "dependency_unavailable": "依存先が利用できません",
    },
}


def register_locale(locale: str, messages: dict[str, str]) -> None:
    _CATALOG.setdefault(locale, {}).update(messages)


def render(violations: pa.Table, locale: str = "en") -> pa.Table:
    """Replace ``message`` by the locale's template for each ``code``
    (codes without a template keep the engine message)."""
    catalog = _CATALOG.get(locale, {})
    if not catalog or violations.num_rows == 0:
        return violations
    codes = list(catalog)
    value_set = pa.array(codes)
    idx = pc.index_in(violations["code"], value_set=value_set)
    repl = pa.array(list(catalog.values()), type=pa.string())
    translated = repl.take(idx.combine_chunks().fill_null(0))
    use = pc.is_valid(idx)
    msg = pc.if_else(use, translated, violations["message"])
    i = violations.schema.get_field_index("message")
    return violations.set_column(i, violations.schema.field(i), msg)
