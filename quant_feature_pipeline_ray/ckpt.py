"""Checkpoint / persisted-state root resolution.

Several pipelines checkpoint intermediate tables with a distributed
`write_parquet` (LSH verified pairs, connected-component labels,
incremental-dedup keep-sets, partitioned exports) and read them back with
`read_parquet`. Those writes are executed BY WORKERS — on a multi-node
cluster every worker node must therefore see the same filesystem at the
checkpoint root, or the read-back observes a partial table (each node's
local fragment only).

Set ``GRAFT_CKPT_ROOT`` to a shared-storage URI (NFS mount, ``s3://…``,
``gs://…`` — anything pyarrow.fs resolves on every node) before starting
the driver. The default ``/tmp`` is correct ONLY for single-node runs
(tests, benches, local dev); `ckpt_path` fails fast if a multi-node
cluster is detected while the root still points at local ``/tmp``.
"""

from __future__ import annotations

import os

_LOCAL_DEFAULT = "/tmp"


def ckpt_root() -> str:
    """The configured checkpoint root (env ``GRAFT_CKPT_ROOT``, default
    ``/tmp``). Read per call so tests can re-point it with monkeypatch."""
    return os.environ.get("GRAFT_CKPT_ROOT", _LOCAL_DEFAULT).rstrip("/")


def _is_remote_uri(root: str) -> bool:
    return "://" in root


def ckpt_path(*parts: str) -> str:
    """Join ``parts`` under the checkpoint root.

    Fails fast when Ray reports more than one node while the root is the
    local default — the one configuration where a distributed checkpoint
    write silently scatters across node-local disks.
    """
    root = ckpt_root()
    if root == _LOCAL_DEFAULT and not _is_remote_uri(root):
        try:
            import ray

            if ray.is_initialized() and len(ray.nodes()) > 1:
                raise RuntimeError(
                    "GRAFT_CKPT_ROOT is unset (defaulting to local /tmp) but "
                    f"this Ray cluster has {len(ray.nodes())} nodes; "
                    "checkpoint tables written by distributed write_parquet "
                    "would land on per-node local disks and read back "
                    "partial. Point GRAFT_CKPT_ROOT at shared storage "
                    "(NFS / s3:// / gs://) visible to every worker node."
                )
        except ImportError:  # pragma: no cover - ray is a hard dep anyway
            pass
    sep = "/" if _is_remote_uri(root) else os.sep
    return root + sep + sep.join(p.strip("/") for p in parts)
