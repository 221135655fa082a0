"""S3Backend contract tests via botocore Stubber (no network).

The backend's atomic create-if-absent (``rename_obj_noreplace``) maps the
reference's DynamoDB-lock rename protocol (``rust/src/storage/s3/mod.rs:373-389``)
onto S3's native conditional PUT (``IfNoneMatch="*"`` → 412 when the key
exists). Stubber pins the exact request parameters, so these tests prove the
wire contract — including that the commit PUT really carries the
precondition header — without any S3 endpoint.
"""

from __future__ import annotations

import datetime
import io

import pytest

boto3 = pytest.importorskip("boto3")
from botocore.stub import Stubber  # noqa: E402

from delta_rs_spark.protocol.storage import (  # noqa: E402
    FileAlreadyExistsError,
    S3Backend,
)

MTIME = datetime.datetime(2026, 1, 2, 3, 4, 5, tzinfo=datetime.timezone.utc)


@pytest.fixture
def s3():
    client = boto3.client("s3", region_name="us-east-1")
    stubber = Stubber(client)
    backend = S3Backend(client=client)
    with stubber:
        yield backend, stubber
    stubber.assert_no_pending_responses()


def _body(data: bytes):
    from botocore.response import StreamingBody

    return StreamingBody(io.BytesIO(data), len(data))


def test_head_and_get(s3):
    backend, stubber = s3
    stubber.add_response(
        "head_object",
        {"ContentLength": 11, "LastModified": MTIME},
        {"Bucket": "bkt", "Key": "tbl/_delta_log/00000000000000000000.json"},
    )
    meta = backend.head_obj("s3://bkt/tbl/_delta_log/00000000000000000000.json")
    assert meta.size == 11
    assert meta.modification_time == MTIME.timestamp()

    stubber.add_response(
        "get_object",
        {"Body": _body(b"hello world")},
        {"Bucket": "bkt", "Key": "tbl/_delta_log/00000000000000000000.json"},
    )
    assert backend.get_obj("s3://bkt/tbl/_delta_log/00000000000000000000.json") == b"hello world"


def test_missing_key_maps_to_file_not_found(s3):
    backend, stubber = s3
    stubber.add_client_error(
        "head_object", service_error_code="404", http_status_code=404
    )
    with pytest.raises(FileNotFoundError):
        backend.head_obj("s3://bkt/missing.json")

    stubber.add_client_error(
        "get_object", service_error_code="NoSuchKey", http_status_code=404
    )
    with pytest.raises(FileNotFoundError):
        backend.get_obj("s3://bkt/missing.json")


def test_list_objs_paginates(s3):
    backend, stubber = s3
    stubber.add_response(
        "list_objects_v2",
        {
            "IsTruncated": True,
            "NextContinuationToken": "tok",
            "Contents": [{"Key": "tbl/_delta_log/a.json", "Size": 1, "LastModified": MTIME}],
        },
        {"Bucket": "bkt", "Prefix": "tbl/_delta_log/"},
    )
    stubber.add_response(
        "list_objects_v2",
        {
            "IsTruncated": False,
            "Contents": [{"Key": "tbl/_delta_log/b.json", "Size": 2, "LastModified": MTIME}],
        },
        {"Bucket": "bkt", "Prefix": "tbl/_delta_log/", "ContinuationToken": "tok"},
    )
    metas = list(backend.list_objs("s3://bkt/tbl/_delta_log"))
    assert [m.path for m in metas] == [
        "s3://bkt/tbl/_delta_log/a.json",
        "s3://bkt/tbl/_delta_log/b.json",
    ]
    assert [m.size for m in metas] == [1, 2]


def test_rename_noreplace_success_uses_conditional_put(s3):
    backend, stubber = s3
    stubber.add_response(
        "get_object",
        {"Body": _body(b'{"commitInfo":{}}')},
        {"Bucket": "bkt", "Key": "tbl/_delta_log/_commit_x.json"},
    )
    # the load-bearing assertion: the PUT must carry IfNoneMatch="*"
    stubber.add_response(
        "put_object",
        {},
        {
            "Bucket": "bkt",
            "Key": "tbl/_delta_log/00000000000000000001.json",
            "Body": b'{"commitInfo":{}}',
            "IfNoneMatch": "*",
        },
    )
    stubber.add_response(
        "delete_object",
        {},
        {"Bucket": "bkt", "Key": "tbl/_delta_log/_commit_x.json"},
    )
    backend.rename_obj_noreplace(
        "s3://bkt/tbl/_delta_log/_commit_x.json",
        "s3://bkt/tbl/_delta_log/00000000000000000001.json",
    )


def test_rename_noreplace_conflict_raises_and_keeps_src(s3):
    backend, stubber = s3
    stubber.add_response(
        "get_object",
        {"Body": _body(b"data")},
        {"Bucket": "bkt", "Key": "tbl/_delta_log/_commit_x.json"},
    )
    stubber.add_client_error(
        "put_object",
        service_error_code="PreconditionFailed",
        http_status_code=412,
        expected_params={
            "Bucket": "bkt",
            "Key": "tbl/_delta_log/00000000000000000001.json",
            "Body": b"data",
            "IfNoneMatch": "*",
        },
    )
    # no delete_object stubbed: losing the race must NOT delete the temp
    # commit — the retry loop re-renames it to version+2
    with pytest.raises(FileAlreadyExistsError):
        backend.rename_obj_noreplace(
            "s3://bkt/tbl/_delta_log/_commit_x.json",
            "s3://bkt/tbl/_delta_log/00000000000000000001.json",
        )


def test_put_and_delete(s3):
    backend, stubber = s3
    stubber.add_response(
        "put_object", {}, {"Bucket": "bkt", "Key": "k", "Body": b"v"}
    )
    backend.put_obj("s3://bkt/k", b"v")
    stubber.add_response("delete_object", {}, {"Bucket": "bkt", "Key": "k"})
    backend.delete_obj("s3://bkt/k")


def test_parse_table_uri_s3_scheme():
    from delta_rs_spark.protocol import storage as storage_mod

    root, backend = storage_mod.parse_table_uri("s3://bkt/warehouse/tbl/")
    assert root == "s3://bkt/warehouse/tbl"
    assert isinstance(backend, S3Backend)
    assert backend.join(root, "_delta_log", "abc.json") == (
        "s3://bkt/warehouse/tbl/_delta_log/abc.json"
    )


def test_split_rejects_non_s3():
    with pytest.raises(ValueError):
        S3Backend._split("file:///tmp/x")


def test_copy_obj_is_server_side_copy(s3):
    """Promotion copy is CopyObject — one API call, no payload transfer."""
    backend, stubber = s3
    stubber.add_response(
        "copy_object",
        {"CopyObjectResult": {"ETag": '"abc"'}},
        {
            "Bucket": "bkt",
            "Key": "tbl/part-final.parquet",
            "CopySource": {"Bucket": "bkt", "Key": "tbl/.tmp/part-0.parquet"},
        },
    )
    backend.copy_obj(
        "s3://bkt/tbl/.tmp/part-0.parquet", "s3://bkt/tbl/part-final.parquet"
    )


def test_get_obj_head_uses_ranged_get(s3):
    """Reading a commit's first line must be a bounded Range request."""
    backend, stubber = s3
    stubber.add_response(
        "get_object",
        {"Body": _body(b"HEAD")},
        {
            "Bucket": "bkt",
            "Key": "tbl/_delta_log/00000000000000000005.json",
            "Range": "bytes=0-65535",
        },
    )
    out = backend.get_obj_head(
        "s3://bkt/tbl/_delta_log/00000000000000000005.json", 65536
    )
    assert out == b"HEAD"
