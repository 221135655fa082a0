import json

from delta_rs_spark.protocol.actions import AddAction
from delta_rs_spark.protocol.stats import file_may_match, prune_files, table_min_max


def _add(path, lo, hi, nulls=0, n=10):
    return AddAction(
        path=path,
        stats=json.dumps(
            {
                "numRecords": n,
                "minValues": {"v": lo},
                "maxValues": {"v": hi},
                "nullCount": {"v": nulls},
            }
        ),
    )


def test_range_skipping():
    a = _add("a", 0, 10)
    assert file_may_match(a, [("v", "=", 5)])
    assert not file_may_match(a, [("v", "=", 11)])
    assert not file_may_match(a, [("v", ">", 10)])
    assert file_may_match(a, [("v", ">=", 10)])
    assert not file_may_match(a, [("v", "<", 0)])
    assert file_may_match(a, [("v", "<=", 0)])


def test_no_stats_keeps_file():
    a = AddAction(path="nostats")
    assert file_may_match(a, [("v", "=", 999)])


def test_all_null_file_skipped_for_comparisons():
    a = _add("allnull", None, None, nulls=10, n=10)
    # minValues/maxValues absent for all-null col
    a.stats = json.dumps({"numRecords": 10, "minValues": {}, "maxValues": {}, "nullCount": {"v": 10}})
    assert not file_may_match(a, [("v", "=", 1)])


def test_string_iso_dates_skip():
    a = AddAction(
        path="d",
        stats=json.dumps(
            {
                "numRecords": 5,
                "minValues": {"ts": "2021-01-01T00:00:00"},
                "maxValues": {"ts": "2021-06-30T23:59:59"},
                "nullCount": {"ts": 0},
            }
        ),
    )
    assert file_may_match(a, [("ts", ">=", "2021-06-01T00:00:00")])
    assert not file_may_match(a, [("ts", ">", "2021-07-01T00:00:00")])


def test_prune_files_and_fold():
    files = [_add("a", 0, 10), _add("b", 20, 30), _add("c", 5, 25)]
    kept = prune_files(files, [("v", ">=", 22)])
    assert [f.path for f in kept] == ["b", "c"]
    assert table_min_max(files, "v") == (0, 30)


def test_ne_skips_constant_file():
    a = _add("const", 7, 7)
    assert not file_may_match(a, [("v", "!=", 7)])
    assert file_may_match(a, [("v", "=", 7)])


def test_boolean_stats_do_not_misprune(spark, tmp_path):
    """bool is an int subclass: a 'false' string literal must not coerce to
    True and prune files whose rows match."""
    from delta_rs_spark import DeltaTable, write_deltalake
    from delta_rs_spark.protocol.stats import _coerce

    assert _coerce(False, "false") == (False, False)
    assert _coerce(True, "false") == (True, False)
    assert _coerce(False, "not-a-bool") is None

    uri = str(tmp_path / "t")
    df = spark.createDataFrame([(1, False), (2, False)], "id long, flag boolean")
    write_deltalake(spark, df, uri)
    t = DeltaTable(uri)
    # stats path: '=' on 'false' must keep the all-false file
    kept = t.snapshot.files(skip_predicates=[("flag", "=", "false")])
    assert len(kept) == len(t.snapshot.files())
    # and a DELETE with the quoted literal actually deletes
    res = t.delete(spark, "flag = 'false'")
    assert res["numDeletedRows"] == 2
