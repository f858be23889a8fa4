"""Table CHECK constraints (`create(constraints=)`, `add_constraint`,
`drop_constraint`): Delta Lake `ALTER TABLE ADD CONSTRAINT ... CHECK`
parity — write-time data-quality contracts enforced on every staged
change batch before publish (one O(batch) column-pruned job; the table
snapshot is untouched on rejection), with Delta's strict NULL semantics
(a NULL expression result is a violation, so `x IS NOT NULL` composes
for free), delete-tombstone exemption (their payload is deliberately
nulled), ADD-time validation of existing rows, and rename/drop-column
guards against dangling expressions.  The reference pipeline's analogue
is per-chunk record-count auditing only (`DataSplit.py:133`,
`Phase3-Data-Extraction.py:123-136`); this is the content-level contract
it lacked.  Parameterized over both storage backends where it matters.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import types as T

from event_driven_etl_msc_research_spark.schemas import TRANSCRIPT_SCHEMA
from event_driven_etl_msc_research_spark.sinks.manifest import (
    ConstraintViolationError,
    ManifestTable,
)

BATCH_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
    ]
)


def _batch(spark, rows):
    cols = ["op", "lsn", "ts", "conv_id", "turn_idx", "role", "text", "tool"]
    pdf = pd.DataFrame(rows, columns=cols)
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s", utc=True)
    return spark.createDataFrame(pdf, BATCH_SCHEMA)


def _rows(n, role="user", text="t", start=0):
    return [
        ("U", 10 + i, 1000 + i, f"c{i % 4}", start + i // 4, role, f"{text}-{i}", None)
        for i in range(n)
    ]


CONS = {
    "turn_nonneg": "turn_idx >= 0",
    "role_known": "role IN ('user', 'assistant', 'tool')",
    "text_nn": "text IS NOT NULL",
}


@pytest.fixture()
def table(spark, tmp_root, storage_factory):
    root = os.path.join(tmp_root, "cons_tbl")
    return ManifestTable.create(
        spark,
        root,
        TRANSCRIPT_SCHEMA,
        n_buckets=2,
        storage=storage_factory(root),
        constraints=CONS,
    )


@pytest.mark.parametrize("mode", ["delta", "cow"])
def test_valid_batches_pass_and_violations_reject_epoch(spark, table, mode):
    assert table.constraints() == CONS
    res = table.merge(_batch(spark, _rows(8)), 0, mode=mode)
    assert res["status"] == "Success"
    v_ok = table.current_version()

    # one bad row (negative turn_idx) rejects the WHOLE epoch pre-publish
    bad = _rows(4, start=100)
    bad[2] = ("U", 99, 2000, "cX", -1, "user", "neg", None)
    with pytest.raises(ConstraintViolationError, match="turn_nonneg"):
        table.merge(_batch(spark, bad), 1, mode=mode)
    assert table.current_version() == v_ok  # snapshot untouched
    assert table.read().count() == 8
    assert not table.epoch_applied(1)

    # the fixed batch then applies cleanly under the SAME epoch id
    fixed = [r for r in bad if r[4] >= 0] + [
        ("U", 99, 2000, "cX", 1, "user", "pos", None)
    ]
    assert table.merge(_batch(spark, fixed), 1, mode=mode)["status"] == "Success"
    assert table.read().count() == 12


def test_multiple_violations_reported_with_counts(spark, table):
    rows = _rows(2)
    rows += [
        ("U", 50, 3000, "cA", -5, "wizard", None, None),  # violates all three
        ("U", 51, 3001, "cB", 7, "user", None, None),  # violates text_nn
    ]
    with pytest.raises(ConstraintViolationError) as ei:
        table.merge(_batch(spark, rows), 0, mode="delta")
    msg = str(ei.value)
    assert "'turn_nonneg'" in msg and "1 row(s)" in msg
    assert "'role_known'" in msg
    assert "'text_nn'" in msg and "2 row(s)" in msg


def test_null_expression_result_is_a_violation(spark, table):
    # Delta CheckDeltaInvariant semantics: role IN (...) over NULL role
    # evaluates NULL -> violation (not ANSI CHECK's pass-on-unknown)
    rows = [("U", 60, 4000, "cN", 0, None, "some text", None)]
    with pytest.raises(ConstraintViolationError, match="role_known"):
        table.merge(_batch(spark, rows), 0, mode="delta")


def test_delete_tombstones_exempt(spark, table):
    table.merge(_batch(spark, _rows(8)), 0, mode="delta")
    # delete_where nulls every non-key payload column in its tombstones —
    # text_nn / role_known must NOT fire on them
    res = table.delete_where("conv_id = 'c1'", epoch_id=1)
    assert res["status"] == "Success"
    assert table.read().filter("conv_id = 'c1'").count() == 0
    # raw D-op batch rows are exempt too
    dels = [("D", 99, 5000, "c2", 0, None, None, None)]
    assert table.merge(_batch(spark, dels), 2, mode="delta")["status"] == "Success"


def test_update_where_and_merge_into_enforce(spark, table):
    table.merge(_batch(spark, _rows(8)), 0, mode="delta")
    with pytest.raises(ConstraintViolationError, match="role_known"):
        table.update_where("conv_id = 'c0'", {"role": "'robot'"}, epoch_id=1)
    res = table.update_where("conv_id = 'c0'", {"role": "'tool'"}, epoch_id=2)
    assert res["status"] == "Success"
    src = _batch(spark, [("U", 200, 9000, "c0", 0, "user", None, None)]).drop(
        "op", "lsn"
    )
    with pytest.raises(ConstraintViolationError, match="text_nn"):
        table.merge_into(
            src, epoch_id=3, when_matched_update={"text": "s.text"}
        )


def test_add_constraint_validates_existing_rows(spark, tmp_root, storage_factory):
    root = os.path.join(tmp_root, "add_tbl")
    t = ManifestTable.create(
        spark, root, TRANSCRIPT_SCHEMA, n_buckets=2, storage=storage_factory(root)
    )
    t.merge(_batch(spark, _rows(8)), 0, mode="delta")
    # existing rows have turn_idx in [0, 1] -> adding a violated rule fails
    with pytest.raises(ConstraintViolationError, match="existing rows"):
        t.add_constraint("turn_big", "turn_idx >= 5")
    assert t.constraints() == {}  # nothing committed
    v = t.current_version()
    assert t.add_constraint("turn_nonneg", "turn_idx >= 0")["status"] == "Success"
    assert t.current_version() == v + 1  # metadata-only commit
    assert t.manifest()["files"] == t.manifest(v)["files"]
    # the change feed's candidate fast path survives the metadata commit
    assert t.changes(v).count() == 0
    # idempotent re-add -> Skipped; silent redefinition -> error
    assert t.add_constraint("turn_nonneg", "turn_idx >= 0")["status"] == "Skipped"
    with pytest.raises(ValueError, match="different expression"):
        t.add_constraint("turn_nonneg", "turn_idx >= 1")
    # now enforced on merges
    with pytest.raises(ConstraintViolationError):
        t.merge(
            _batch(spark, [("U", 99, 9000, "z", -1, "user", "x", None)]),
            7,
            mode="delta",
        )
    # drop -> the same batch applies
    assert t.drop_constraint("turn_nonneg")["status"] == "Success"
    assert t.drop_constraint("turn_nonneg")["status"] == "Skipped"
    assert (
        t.merge(
            _batch(spark, [("U", 99, 9000, "z", -1, "user", "x", None)]),
            7,
            mode="delta",
        )["status"]
        == "Success"
    )


def test_add_constraint_on_empty_table_skips_the_scan(spark, tmp_root):
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "e"), TRANSCRIPT_SCHEMA, n_buckets=2
    )
    assert t.add_constraint("nn", "text IS NOT NULL")["status"] == "Success"
    assert t.constraints() == {"nn": "text IS NOT NULL"}


def test_constraint_misuse_rejected(spark, tmp_root):
    t = ManifestTable.create(
        spark, os.path.join(tmp_root, "m"), TRANSCRIPT_SCHEMA, n_buckets=2
    )
    with pytest.raises(ValueError, match="does not resolve"):
        t.add_constraint("ghost", "no_such_col > 0")
    with pytest.raises(ValueError, match="does not resolve"):
        t.add_constraint("agg", "max(turn_idx) > 0")  # aggregates illegal
    with pytest.raises(ValueError, match="must be a boolean"):
        t.add_constraint("notbool", "turn_idx + 1")
    with pytest.raises(ValueError, match="invalid constraint name"):
        t.add_constraint("", "turn_idx >= 0")
    with pytest.raises(ValueError, match="empty expression"):
        t.add_constraint("blank", "   ")
    # create() validates the same way
    with pytest.raises(ValueError, match="does not resolve"):
        ManifestTable.create(
            spark,
            os.path.join(tmp_root, "m2"),
            TRANSCRIPT_SCHEMA,
            constraints={"bad": "ghost_col = 1"},
        )


def test_rename_and_drop_column_guarded(spark, tmp_root, table):
    table.merge(_batch(spark, _rows(4)), 0, mode="delta")
    with pytest.raises(ValueError, match="role_known"):
        table.rename_column("role", "speaker")
    with pytest.raises(ValueError, match="text_nn"):
        table.drop_column("text")
    # unreferenced columns still rename/drop freely
    assert table.rename_column("tool", "tool_name")["status"] == "Success"
    # after dropping the constraint the rename goes through
    table.drop_constraint("role_known")
    assert table.rename_column("role", "speaker")["status"] == "Success"


def test_constraints_survive_compaction_and_rebucket(spark, tmp_root):
    t = ManifestTable.create(
        spark,
        os.path.join(tmp_root, "c"),
        TRANSCRIPT_SCHEMA,
        n_buckets=2,
        constraints={"turn_nonneg": "turn_idx >= 0"},
    )
    for e in range(3):
        t.merge(_batch(spark, _rows(4, start=10 * e)), e, mode="delta")
    t.compact()
    assert t.constraints() == {"turn_nonneg": "turn_idx >= 0"}
    t.rebucket(4)
    assert t.constraints() == {"turn_nonneg": "turn_idx >= 0"}
    with pytest.raises(ConstraintViolationError):
        t.merge(
            _batch(spark, [("U", 999, 9999, "q", -3, "user", "x", None)]),
            50,
            mode="delta",
        )


def test_enforcement_adds_zero_jobs(spark, tmp_root):
    """Violation counts ride the staging write's Observation: a
    constrained merge launches EXACTLY the same number of Spark jobs as an
    unconstrained one — enforcement never re-reads the batch."""
    sc = spark.sparkContext

    def jobs(tag, fn):
        sc.setJobGroup(tag, tag)
        fn()
        sc.setJobGroup("_idle", "_idle")
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    plain = ManifestTable.create(
        spark, os.path.join(tmp_root, "jc_plain"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    cons = ManifestTable.create(
        spark,
        os.path.join(tmp_root, "jc_cons"),
        TRANSCRIPT_SCHEMA,
        n_buckets=4,
        constraints=CONS,
    )
    rows = _rows(40)
    n_plain = jobs("jc-plain", lambda: plain.merge(_batch(spark, rows), 0, mode="delta"))
    n_cons = jobs("jc-cons", lambda: cons.merge(_batch(spark, rows), 0, mode="delta"))
    assert n_cons == n_plain
    # same relationship on the CoW stage-first path
    n_plain2 = jobs("jc-plain2", lambda: plain.merge(_batch(spark, _rows(40, start=50)), 1, mode="cow"))
    n_cons2 = jobs("jc-cons2", lambda: cons.merge(_batch(spark, _rows(40, start=50)), 1, mode="cow"))
    assert n_cons2 == n_plain2


def test_engine_passthrough_and_branch_guard(spark, tmp_root):
    from event_driven_etl_msc_research_spark.streaming.engine import CDCEngine
    from event_driven_etl_msc_research_spark.schemas import CHANGE_EVENT_SCHEMA

    eng = CDCEngine(
        spark,
        os.path.join(tmp_root, "eng_tbl"),
        change_schema=CHANGE_EVENT_SCHEMA,
        n_buckets=2,
        constraints={"turn_nonneg": "turn_idx >= 0"},
    )
    assert eng.table.constraints() == {"turn_nonneg": "turn_idx >= 0"}
    b = eng.table.create_branch("audit")
    with pytest.raises(ValueError, match="main-table operation"):
        b.add_constraint("x", "turn_idx >= 0")
    with pytest.raises(ValueError, match="main-table operation"):
        b.drop_constraint("turn_nonneg")
    # the branch handle still ENFORCES the table's constraints
    with pytest.raises(ConstraintViolationError):
        b.merge(
            _batch(spark, [("U", 1, 100, "a", -1, "user", "x", None)]),
            0,
            mode="delta",
        )


def test_concurrent_add_constraint_revalidates_racing_merge(
    spark, tmp_root, storage_factory
):
    """A merge racing a concurrent add_constraint must NOT publish rows the
    new constraint never validated: the rebase detects the constraint-set
    change, redoes the merge against the winner's manifest, and the
    re-staging observation rejects the batch."""
    root = os.path.join(tmp_root, "race")
    a = ManifestTable.create(
        spark, root, TRANSCRIPT_SCHEMA, n_buckets=2, storage=storage_factory(root)
    )
    b = ManifestTable(spark, root, storage=storage_factory(root))
    a.merge(_batch(spark, _rows(4)), 0, mode="delta")

    fired = {"done": False}

    def hook(_m):
        # fires between A's staging write and A's manifest publish —
        # writer B lands the constraint first, so A loses the race
        if not fired["done"]:
            fired["done"] = True
            st = b.add_constraint("turn_nonneg", "turn_idx >= 0")
            assert st["status"] == "Success"

    bad = [("U", 99, 9000, "z", -1, "user", "x", None)]
    with pytest.raises(ConstraintViolationError, match="turn_nonneg"):
        a.merge(_batch(spark, bad), 1, mode="delta", before_publish=hook)
    assert a.constraints() == {"turn_nonneg": "turn_idx >= 0"}
    assert not a.epoch_applied(1)  # nothing published under the epoch
    # a VALID batch racing the same way still commits (redo, then clean)
    fired["done"] = False
    ok = [("U", 100, 9100, "z", 5, "user", "y", None)]

    def hook2(_m):
        if not fired["done"]:
            fired["done"] = True
            b.drop_constraint("turn_nonneg")

    st = a.merge(_batch(spark, ok), 2, mode="delta", before_publish=hook2)
    assert st["status"] == "Success"
    assert a.constraints() == {}
