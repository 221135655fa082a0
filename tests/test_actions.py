import json

from delta_rs_spark.protocol.actions import (
    AddAction,
    CommitInfoAction,
    MetaDataAction,
    ProtocolAction,
    RemoveAction,
    TxnAction,
    action_to_log_line,
    actions_to_log_entry,
    parse_action,
    parse_log_entry,
)
from delta_rs_spark.protocol.state import TableState


def test_add_round_trip():
    add = AddAction(
        path="year=2020/part-0001.snappy.parquet",
        size=1234,
        partition_values={"year": "2020"},
        modification_time=1587968586000,
        data_change=True,
        stats=json.dumps(
            {
                "numRecords": 10,
                "minValues": {"v": 1},
                "maxValues": {"v": 9},
                "nullCount": {"v": 0},
            }
        ),
    )
    line = action_to_log_line(add)
    back = parse_action(json.loads(line))
    assert back == add
    assert back.num_records == 10


def test_nested_stats_parse():
    # struct-valued min/max like the reference's nested-stats test
    stats = {
        "numRecords": 22,
        "minValues": {"a": 1, "nested": {"b": 2, "c": "a"}},
        "maxValues": {"a": 10, "nested": {"b": 20, "c": "z"}},
        "nullCount": {"a": 1, "nested": {"b": 0, "c": 1}},
    }
    add = AddAction(path="x.parquet", stats=json.dumps(stats))
    parsed = add.get_stats()
    assert parsed["minValues"]["nested"]["c"] == "a"
    assert parsed["nullCount"]["nested"]["b"] == 0


def test_all_action_types_round_trip():
    actions = [
        MetaDataAction(
            id="guid-1",
            schema_string='{"type":"struct","fields":[]}',
            partition_columns=["p"],
            configuration={"k": "v"},
            created_time=1,
        ),
        ProtocolAction(1, 2),
        TxnAction(app_id="app", version=7, last_updated=99),
        RemoveAction(path="a.parquet", deletion_timestamp=5, data_change=True),
        CommitInfoAction(info={"operation": "WRITE", "custom": [1, 2]}),
    ]
    entry = actions_to_log_entry(actions)
    back = parse_log_entry(entry)
    assert back == actions


def test_state_fold_semantics():
    st = TableState()
    st.apply(AddAction(path="a"))
    st.apply(AddAction(path="b"))
    st.apply(RemoveAction(path="a", deletion_timestamp=1))
    assert st.file_paths == ["b"]
    assert "a" in st.tombstones
    # re-add over tombstone
    st.apply(AddAction(path="a"))
    assert set(st.file_paths) == {"a", "b"}
    assert "a" not in st.tombstones
    # metaData wholly replaces
    st.apply(MetaDataAction(id="1", schema_string="{}"))
    st.apply(MetaDataAction(id="2", schema_string="{}"))
    assert st.metadata.id == "2"
    # txn upsert takes the newest version
    st.apply(TxnAction(app_id="x", version=1))
    st.apply(TxnAction(app_id="x", version=3))
    assert st.app_transaction_version["x"] == 3
