"""Driver-contract registry invariants: queries()/oracle_sql() key
parity, rotation well-formedness, and the no-Ray-at-import rule."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __ray_entry__ as E


def test_registry_keys_and_rotation():
    q = E.queries()
    o = E.oracle_sql()
    keys = list(q)
    # every query has an oracle; no orphan oracles
    assert set(o) == set(keys)
    assert len(set(keys)) == len(keys)
    assert all(callable(f) for f in q.values())
    # the driver's correctness window (first 50 entries) must be the
    # rotation front: names from _NEVER_DRIVER_SAMPLED, in its order
    front = [k for k in E._NEVER_DRIVER_SAMPLED if k in q]
    assert keys[:len(front)] == front
    assert len(front) >= 50
    # rotation list has no duplicates and no unknown names
    assert len(set(E._NEVER_DRIVER_SAMPLED)) == \
        len(E._NEVER_DRIVER_SAMPLED)
    assert set(E._NEVER_DRIVER_SAMPLED) <= set(keys)


def test_oracle_sql_is_text():
    for name, sql in E.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name
