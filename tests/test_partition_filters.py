import pytest

from delta_rs_spark import DeltaTable
from delta_rs_spark.protocol.actions import AddAction
from delta_rs_spark.protocol.partitions import (
    InvalidPartitionFilterError,
    compile_filters,
    file_matches,
)


def _add(pv):
    return AddAction(path="x", partition_values=pv)


def test_filter_ops():
    add = _add({"year": "2020", "month": "2"})
    assert file_matches(add, compile_filters([("year", "=", "2020")]))
    assert not file_matches(add, compile_filters([("year", "!=", "2020")]))
    assert file_matches(add, compile_filters([("month", "in", ["1", "2"])]))
    assert not file_matches(add, compile_filters([("month", "not in", ["1", "2"])]))
    # conjunction
    assert not file_matches(
        add, compile_filters([("year", "=", "2020"), ("month", "=", "3")])
    )


def test_missing_key_never_matches():
    add = _add({"year": "2020"})
    assert not file_matches(add, compile_filters([("day", "=", "1")]))


def test_invalid_filters_raise():
    with pytest.raises(InvalidPartitionFilterError):
        compile_filters([("year", "like", "2020")])
    with pytest.raises(InvalidPartitionFilterError):
        compile_filters([("year", "in", "2020")])  # scalar for 'in'
    with pytest.raises(InvalidPartitionFilterError):
        compile_filters([("year", "=")])  # wrong arity


def test_partitioned_golden_pruning(golden):
    t = DeltaTable(golden("delta-0.8.0-partitioned"))
    all_files = t.files()
    assert len(all_files) == 6
    f_2020 = t.files(partition_filters=[("year", "=", "2020")])
    assert len(f_2020) == 3
    assert all("year=2020" in f for f in f_2020)
    f_in = t.files(partition_filters=[("month", "in", ["2", "12"]), ("year", "=", "2020")])
    assert len(f_in) == 2
    f_ne = t.files(partition_filters=[("year", "!=", "2020")])
    assert len(f_ne) == 3


def test_partitioned_read_values(spark, golden):
    t = DeltaTable(golden("delta-0.8.0-partitioned"))
    df = t.to_df(spark, partition_filters=[("year", "=", "2021"), ("month", "=", "12")])
    rows = sorted(r.value for r in df.collect())
    assert rows == ["5", "6", "7"]  # `value` is a string column in this fixture
    # partition columns come back typed per the table schema (strings here)
    assert dict(df.dtypes)["year"] == "string"
