"""Property-based tests (hypothesis) for the pure-Python protocol layer.

The reference has no randomized testing (SURVEY §5); these harden the three
most algebra-like pieces — state fold, partition-filter matching, and
stats-based pruning — against the whole input space, not just the fixtures.
No SparkSession involved: every property runs in microseconds.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from delta_rs_spark.protocol.actions import AddAction, RemoveAction
from delta_rs_spark.protocol.partitions import compile_filters, file_matches
from delta_rs_spark.protocol.state import TableState
from delta_rs_spark.protocol.stats import file_may_match

paths = st.text(alphabet="abcdef", min_size=1, max_size=3)


@st.composite
def action_sequences(draw):
    ops = draw(
        st.lists(
            st.tuples(st.sampled_from(["add", "remove"]), paths), min_size=0, max_size=40
        )
    )
    return [
        AddAction(path=p) if kind == "add" else RemoveAction(path=p)
        for kind, p in ops
    ]


@given(action_sequences())
def test_state_fold_matches_naive_replay(actions):
    """Fold result == the obvious O(n²) specification: a path is active iff
    its last action was an add; tombstoned iff its last action was a remove."""
    st_ = TableState()
    st_.apply_all(actions)

    last: dict[str, str] = {}
    for a in actions:
        last[a.path] = "add" if isinstance(a, AddAction) else "remove"
    expected_active = {p for p, k in last.items() if k == "add"}
    expected_tombstoned = {p for p, k in last.items() if k == "remove"}

    assert set(st_.files) == expected_active
    assert set(st_.tombstones) == expected_tombstoned
    assert not (set(st_.files) & set(st_.tombstones))


pv_values = st.one_of(st.none(), st.text(alphabet="0123456789xy", max_size=3))
filter_ops = st.sampled_from(["=", "!=", "in", "not in"])


@st.composite
def filters_and_values(draw):
    keys = ["k1", "k2"]
    flts = []
    for _ in range(draw(st.integers(0, 3))):
        key = draw(st.sampled_from(keys))
        op = draw(filter_ops)
        if op in ("in", "not in"):
            val = draw(st.lists(st.text(alphabet="0123456789xy", max_size=3), max_size=3))
        else:
            val = draw(st.text(alphabet="0123456789xy", max_size=3))
        flts.append((key, op, val))
    pv = {k: draw(pv_values) for k in keys}
    return flts, pv


@given(filters_and_values())
def test_partition_filter_matches_reference_semantics(fv):
    """file_matches == the documented spec: conjunction; missing/None
    partition value never matches any op (reference string-only compare)."""
    flts, pv = fv
    add = AddAction(path="f", partition_values=pv)

    def spec_one(key, op, val):
        actual = pv.get(key)
        if actual is None:
            return False
        if op == "=":
            return actual == val
        if op == "!=":
            return actual != val
        if op == "in":
            return actual in val
        return actual not in val

    expected = all(spec_one(*f) for f in flts)
    assert file_matches(add, compile_filters(flts)) == expected


@st.composite
def stats_and_predicate(draw):
    rows = draw(st.lists(st.integers(-50, 50), min_size=1, max_size=20))
    has_nulls = draw(st.booleans())
    op = draw(st.sampled_from(["=", "!=", "<", "<=", ">", ">="]))
    lit = draw(st.integers(-60, 60))
    return rows, has_nulls, op, lit


@given(stats_and_predicate())
@settings(max_examples=300)
def test_stats_pruning_is_conservative(sp):
    """A file is NEVER pruned if some row actually satisfies the predicate
    (false positives allowed, false negatives never — data skipping must be
    sound or queries silently lose rows)."""
    rows, has_nulls, op, lit = sp
    stats = {
        "numRecords": len(rows) + (1 if has_nulls else 0),
        "minValues": {"v": min(rows)},
        "maxValues": {"v": max(rows)},
        "nullCount": {"v": 1 if has_nulls else 0},
    }
    add = AddAction(path="f", stats=json.dumps(stats))

    def sat(r):
        return {
            "=": r == lit, "!=": r != lit, "<": r < lit,
            "<=": r <= lit, ">": r > lit, ">=": r >= lit,
        }[op]

    if any(sat(r) for r in rows):
        assert file_may_match(add, [("v", op, lit)])


# ---- DML skip-tuple parser ------------------------------------------------

ident = st.text(alphabet="abcz_", min_size=1, max_size=5)
cmp_ops = st.sampled_from(["=", "==", "!=", "<>", "<", "<=", ">", ">="])
lit_ints = st.integers(min_value=-10**6, max_value=10**6)
lit_strs = st.text(alphabet="xy0 '", max_size=6)


@st.composite
def simple_conjunctions(draw):
    n = draw(st.integers(min_value=1, max_value=4))
    conjuncts = []
    expected = []
    for _ in range(n):
        col = draw(ident)
        op = draw(cmp_ops)
        if draw(st.booleans()):
            v = draw(lit_ints)
            lit = str(v)
        else:
            v = draw(lit_strs)
            lit = "'" + v.replace("'", "''") + "'"
        conjuncts.append(f"{col} {op} {lit}")
        norm = {"==": "=", "<>": "!="}.get(op, op)
        expected.append((col, norm, v))
    return " AND ".join(conjuncts), expected


@given(simple_conjunctions())
def test_skip_tuple_parser_roundtrip(case):
    """Any simple conjunction parses to exactly its (col, op, literal)
    tuples — the pruner never sees a wrong hint (which could drop a file
    that contains matching rows)."""
    from delta_rs_spark.dml import _skip_tuples_from_predicate

    predicate, expected = case
    assert _skip_tuples_from_predicate(predicate) == expected


@given(st.text(max_size=40))
def test_skip_tuple_parser_never_crashes(s):
    from delta_rs_spark.dml import _skip_tuples_from_predicate

    _skip_tuples_from_predicate(s)


dv_descriptors = st.one_of(
    st.none(),
    st.fixed_dictionaries(
        {
            "storageType": st.just("d"),
            "paths": st.lists(
                st.text(st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=12).map(
                    lambda s: f"_deletion_vectors/{s}"
                ),
                min_size=1,
                max_size=3,
            ),
            "cardinality": st.integers(min_value=0, max_value=1 << 40),
            "sizeInBytes": st.integers(min_value=0, max_value=1 << 40),
        }
    ),
)


@given(
    path=st.text(st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=20),
    ts=st.one_of(st.none(), st.integers(min_value=0, max_value=1 << 50)),
    dv=dv_descriptors,
)
def test_remove_action_json_roundtrip_with_dv(path, ts, dv):
    from delta_rs_spark.protocol.actions import RemoveAction, parse_log_entry, action_to_log_line

    r = RemoveAction(
        path=path,
        deletion_timestamp=ts,
        data_change=True,
        extended_file_metadata=True,
        partition_values={"p": "1"},
        size=123,
        deletion_vector=dv,
    )
    (back,) = parse_log_entry(action_to_log_line(r))
    assert back == r


@given(
    reader=st.integers(min_value=1, max_value=3),
    writer=st.integers(min_value=2, max_value=7),
    rf=st.one_of(st.none(), st.lists(st.sampled_from(["deletionVectors", "columnMapping"]), max_size=2)),
    wf=st.one_of(st.none(), st.lists(st.sampled_from(["deletionVectors"]), max_size=1)),
)
def test_protocol_action_features_roundtrip(reader, writer, rf, wf):
    from delta_rs_spark.protocol.actions import ProtocolAction, parse_log_entry, action_to_log_line

    p = ProtocolAction(
        min_reader_version=reader,
        min_writer_version=writer,
        reader_features=rf,
        writer_features=wf,
    )
    (back,) = parse_log_entry(action_to_log_line(p))
    assert back == p


@st.composite
def commit_sequences(draw):
    """A list of commits, each a list of add/remove/txn/domain actions."""
    from delta_rs_spark.protocol.actions import DomainMetadataAction, TxnAction

    n_commits = draw(st.integers(min_value=1, max_value=8))
    commits = []
    for _ in range(n_commits):
        ops = draw(
            st.lists(
                st.tuples(
                    st.sampled_from(["add", "remove", "txn", "domain"]),
                    paths,
                    st.integers(min_value=0, max_value=5),
                ),
                min_size=0,
                max_size=6,
            )
        )
        commit = []
        for kind, p, v in ops:
            if kind == "add":
                commit.append(AddAction(path=p))
            elif kind == "remove":
                commit.append(RemoveAction(path=p))
            elif kind == "txn":
                commit.append(TxnAction(app_id=p, version=v))
            else:
                # v == 0 → a domain REMOVAL: the reconciler must retain it
                # (it cancels a domain set before the compacted range)
                commit.append(
                    DomainMetadataAction(
                        domain=p,
                        configuration=json.dumps({"v": v}),
                        removed=(v == 0),
                    )
                )
        commits.append(commit)
    return commits


@given(commit_sequences())
@settings(max_examples=200)
def test_log_compaction_reconciliation_equals_direct_replay(commits):
    """Folding (prefix-state + compaction of a range) must equal folding
    every commit — for ANY action mix and ANY range the compactor covers."""
    from delta_rs_spark.protocol.actions import ActionReconciler

    # direct replay of everything
    direct = TableState()
    for c in commits:
        direct.apply_all(c)

    # replay via a compaction covering the whole tail after the first commit
    rec = ActionReconciler()
    for c in commits[1:]:
        rec.apply_all(c)
    via = TableState()
    via.apply_all(commits[0])
    via.apply_all(rec.reconciled())

    assert set(via.files) == set(direct.files)
    assert set(via.tombstones) == set(direct.tombstones)
    assert via.app_transaction_version == direct.app_transaction_version
    assert via.domain_metadata == direct.domain_metadata


# ---- Avro binary encoding (uniform/avro.py) --------------------------------

AVRO_RECORD_SCHEMA = {
    "type": "record",
    "name": "prop",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": ["null", "long"], "default": None},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "bytes"},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "kv", "type": {"type": "map", "values": "string"}},
        {"name": "ok", "type": "boolean"},
    ],
}

avro_records = st.fixed_dictionaries(
    {
        "s": st.text(max_size=40),
        "n": st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
        "d": st.floats(allow_nan=False),
        "b": st.binary(max_size=32),
        "xs": st.lists(st.integers(-(2**63), 2**63 - 1), max_size=8),
        "kv": st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=5),
        "ok": st.booleans(),
    }
)


@given(st.lists(avro_records, max_size=20), st.sampled_from(["null", "deflate"]))
@settings(max_examples=150, deadline=None)
def test_avro_container_round_trip_property(records, codec):
    from delta_rs_spark.uniform import avro

    data = avro.write_container(AVRO_RECORD_SCHEMA, records, codec=codec)
    schema, _meta, back = avro.read_container(data)
    assert schema == AVRO_RECORD_SCHEMA
    assert back == records


@given(st.integers(-(2**63), 2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_avro_zigzag_long_round_trip(v):
    import io

    from delta_rs_spark.uniform import avro

    buf = io.BytesIO()
    avro.write_long(buf, v)
    buf.seek(0)
    assert avro.read_long(buf) == v


@given(st.lists(avro_records, max_size=20))
@settings(max_examples=100, deadline=None)
def test_avro_compiled_writer_matches_interpreter(records):
    """compile_writer must produce byte-identical encodings to write_datum."""
    import io

    from delta_rs_spark.uniform import avro

    interp = io.BytesIO()
    for r in records:
        avro.write_datum(interp, AVRO_RECORD_SCHEMA, r)
    compiled = bytearray()
    enc = avro.compile_writer(AVRO_RECORD_SCHEMA)
    for r in records:
        enc(compiled, r)
    assert bytes(compiled) == interp.getvalue()
