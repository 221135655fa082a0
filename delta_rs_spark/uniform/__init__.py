"""UniForm: Iceberg metadata generation over Delta tables.

``delta.universalFormat.enabledFormats=iceberg`` keeps an Apache
Iceberg-spec metadata tree under ``<table>/metadata/`` in sync with the
Delta log, so Iceberg-compatible engines can read the same parquet data
files without copying them. Parity-plus surface — the reference engine
(delta-io/delta.rs v0) predates UniForm entirely.
"""

from .iceberg import (
    IcebergConversionError,
    convert_iceberg_to_delta,
    convert_snapshot,
    expire_snapshots,
    expire_snapshots_referencing,
    read_delete_files,
    read_file_list,
)

__all__ = [
    "convert_snapshot",
    "convert_iceberg_to_delta",
    "expire_snapshots",
    "expire_snapshots_referencing",
    "read_file_list",
    "read_delete_files",
    "IcebergConversionError",
]
