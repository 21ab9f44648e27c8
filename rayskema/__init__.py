"""rayskema — a Ray-Data-native schema + constraint validation engine.

Built from scratch with the validation capabilities of reoring/goskema
(reference at /root/reference, see SURVEY.md) re-expressed over columnar
data: declare a :class:`~rayskema.schema.TableSchema` once, compile it
to vectorized Arrow kernels, and evaluate it over Parquet tables as a
``ray.data.Dataset`` pipeline — ``map_batches`` over zero-copy Arrow
batches for row/batch-local checks, actor pools holding compiled plans
and streaming sketches, and conv_id-keyed shuffles for the table-scope
checks (uniqueness, referential integrity, per-group rules, drift).
"""

from .issues import (  # noqa: F401
    ALL_CODES, Issue, column_path, sort_violations, violations_schema,
)
from .schema import (  # noqa: F401
    ByteBounds, Column, ContiguousRule, CrossFieldRule, DriftRule, Enum,
    GroupCountRule, LenBounds, MapKeyRegex, MonotonicRule, NonNull,
    Normalizer, Range, RefIntegrityRule, Regex, StructField, TableSchema,
    TsFormat, UnionRule, UniqueRule, Unknown, transcript_schema,
)
from .plan import (  # noqa: F401
    BatchValidator, ConstraintPlan, decode_rfc3339, encode_canonical,
    encode_preserving, normalize_batch,
)
from .contract import (  # noqa: F401
    export_contract, import_contract, load_contract, save_contract,
)

__version__ = "0.1.0"
