"""Driver-gate registry invariants: the head the driver samples must
cover every operator family, stay exactly at the cap, and every
query/oracle pair must be consistently registered."""

from __future__ import annotations

from vector_database_spark import workload as W


def test_head_covers_every_family():
    """The driver samples the FIRST 50 queries; a family living only
    in the tail would record zero rows in CORRECTNESS_r{N} (the
    round-2 silent-rotation bug). Family = leading letter."""
    names = list(W.queries())
    head = names[: W._DRIVER_CAP]
    assert len(head) == W._DRIVER_CAP
    all_fams = {n[0] for n in names}
    head_fams = {n[0] for n in head}
    assert head_fams == all_fams, (
        f"families missing from the driver head: {all_fams - head_fams}"
    )


def test_tail_is_exactly_the_overflow():
    names = list(W.queries())
    assert names[W._DRIVER_CAP:] == W._DRIVER_TAIL


def test_oracles_reference_registered_queries():
    q, o = W.queries(), W.oracle_sql()
    assert set(o) <= set(q)
    for name, sql in o.items():
        assert sql and sql.strip(), name
