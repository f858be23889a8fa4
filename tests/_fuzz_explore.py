"""Offline fuzz exploration (not collected by default — run explicitly:
``pytest tests/_fuzz_explore.py``).  Wider seed sweep of the DDL×DML
metamorphic fuzzer; the committed suite pins two representative seeds."""
import pytest

from tests.test_dml_fuzz import (  # noqa: F401 (fixtures via conftest)
    test_random_branch_wap_sequence_matches_oracle as _wap,
    test_random_constraint_dml_sequence_matches_oracle as _con,
    test_random_ddl_dml_sequence_matches_oracle as _ddl,
    test_random_dml_sequence_matches_oracle as _dml,
    test_physical_config_invariance as _cfg,
    test_random_crash_recovery_sequence_matches_oracle as _crash,
    test_random_mv_sequence_matches_full_group_by as _mv,
    test_random_replication_sequence_mirrors_upstream as _rep,
)


@pytest.mark.parametrize(
    "seed,mode",
    [(s, m) for s in (3, 17, 31, 43, 59) for m in ("delta", "cow")],
)
def test_dml_fuzz_sweep(spark, tmp_root, seed, mode):
    _dml(spark, tmp_root, seed, mode)


@pytest.mark.parametrize(
    "seed,mode",
    [(s, m) for s in (2, 5, 7, 13, 19, 23) for m in ("delta", "cow")],
)
def test_ddl_fuzz_sweep(spark, tmp_root, seed, mode):
    _ddl(spark, tmp_root, seed, mode)


@pytest.mark.parametrize(
    "seed,mode",
    [(s, m) for s in (3, 11, 37, 41) for m in ("delta", "cow")],
)
def test_constraint_fuzz_sweep(spark, tmp_root, seed, mode):
    _con(spark, tmp_root, seed, mode)


@pytest.mark.parametrize(
    "seed,mode",
    [(s, m) for s in (1, 19, 47, 61) for m in ("delta", "cow")],
)
def test_wap_fuzz_sweep(spark, tmp_root, seed, mode):
    _wap(spark, tmp_root, seed, mode)


@pytest.mark.parametrize(
    "seed,mode",
    [(s, m) for s in (29, 67) for m in ("delta", "cow")],
)
def test_replication_fuzz_sweep(spark, tmp_root, seed, mode):
    _rep(spark, tmp_root, seed, mode)


@pytest.mark.parametrize(
    "seed,mode",
    [(s, m) for s in (5, 43) for m in ("delta", "cow")],
)
def test_mv_fuzz_sweep(spark, tmp_root, seed, mode):
    _mv(spark, tmp_root, seed, mode)


@pytest.mark.parametrize("seed", [7, 29, 41])
def test_config_invariance_sweep(spark, tmp_root, seed):
    _cfg(spark, tmp_root, seed)


@pytest.mark.parametrize(
    "seed,mode",
    [(s, m) for s in (9, 53) for m in ("delta", "cow")],
)
def test_crash_recovery_fuzz_sweep(spark, tmp_root, seed, mode):
    _crash(spark, tmp_root, seed, mode)
