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


def test_files_by_partitions_reference_contract(golden):
    """Exact port of the reference's files_by_partitions expectations
    (python/tests/test_table_read.py:115-172) against the same golden table."""
    path = golden("delta-0.8.0-partitioned")
    dt = DeltaTable(path)

    assert dt.files_by_partitions([("day", "=", "3")]) == [
        f"{path}/year=2020/month=2/day=3/part-00000-94d16827-f2fd-42cd-a060-f67ccc63ced9.c000.snappy.parquet"
    ]
    assert dt.files_by_partitions([("day", "!=", "3")]) == [
        f"{path}/year=2020/month=1/day=1/part-00000-8eafa330-3be9-4a39-ad78-fd13c2027c7e.c000.snappy.parquet",
        f"{path}/year=2020/month=2/day=5/part-00000-89cdd4c8-2af7-4add-8ea3-3990b2f027b5.c000.snappy.parquet",
        f"{path}/year=2021/month=12/day=20/part-00000-9275fdf4-3961-4184-baa0-1c8a2bb98104.c000.snappy.parquet",
        f"{path}/year=2021/month=12/day=4/part-00000-6dc763c0-3e8b-4d52-b19e-1f92af3fbb25.c000.snappy.parquet",
        f"{path}/year=2021/month=4/day=5/part-00000-c5856301-3439-4032-a6fc-22b7bc92bebb.c000.snappy.parquet",
    ]
    assert dt.files_by_partitions([("day", "in", ["3", "20"])]) == [
        f"{path}/year=2020/month=2/day=3/part-00000-94d16827-f2fd-42cd-a060-f67ccc63ced9.c000.snappy.parquet",
        f"{path}/year=2021/month=12/day=20/part-00000-9275fdf4-3961-4184-baa0-1c8a2bb98104.c000.snappy.parquet",
    ]
    assert dt.files_by_partitions(
        [("day", "not in", ["3", "20"]), ("year", "=", "2021")]
    ) == [
        f"{path}/year=2021/month=12/day=4/part-00000-6dc763c0-3e8b-4d52-b19e-1f92af3fbb25.c000.snappy.parquet",
        f"{path}/year=2021/month=4/day=5/part-00000-c5856301-3439-4032-a6fc-22b7bc92bebb.c000.snappy.parquet",
    ]
    # unknown key: no matches, no error
    assert dt.files_by_partitions([("unknown", "=", "3")]) == []
    # invalid op / list with "=" / non-string scalar all raise
    with pytest.raises(InvalidPartitionFilterError):
        dt.files_by_partitions([("invalid_operation", "=>", "3")])
    with pytest.raises(InvalidPartitionFilterError, match="String"):
        dt.files_by_partitions([("invalid_operation", "=", ["3", "20"])])
    with pytest.raises(InvalidPartitionFilterError, match="String"):
        dt.files_by_partitions([("day", "=", 3)])
