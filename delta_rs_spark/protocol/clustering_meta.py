"""Clustered tables (public Delta ``clustering`` writer feature).

The clustering column set lives in the ``delta.clustering`` domain-metadata
configuration as ``{"clusteringColumns": [["a"], ["b", "c"]]}`` — arrays of
(physical) name paths, exactly the public layout — so any conformant writer
can discover and maintain the layout. This engine's OPTIMIZE uses the
declared columns as the default multi-dimensional (Z-order) rewrite key
when the caller gives no explicit sort/zorder, which is the maintenance
loop of a clustered table: new files land unordered, OPTIMIZE re-clusters.

The reference (delta-rs v0) predates the feature; implemented from the
public Delta protocol spec.
"""

from __future__ import annotations

import json
from typing import Optional

DOMAIN = "delta.clustering"
FEATURE_NAME = "clustering"


def domain_action(columns: list[str]):
    from .actions import DomainMetadataAction

    return DomainMetadataAction(
        domain=DOMAIN,
        configuration=json.dumps({"clusteringColumns": [[c] for c in columns]}),
    )


def clustering_columns(state) -> Optional[list[str]]:
    """Declared clustering columns (logical top-level names), or None."""
    raw = state.domain_metadata.get(DOMAIN)
    if not raw:
        return None
    try:
        cols = json.loads(raw).get("clusteringColumns") or []
        return [path[0] for path in cols if path]
    except (ValueError, TypeError, IndexError):
        return None
