"""Checkpointing via orbax (ref trainer pyc 180-187 saves
``{model, optimizer, lr_scheduler, n_epochs, n_iters}`` to
``latest_model.pt`` each epoch and ``best_model.pt`` per benchmark on IoU
improvement, pyc 218-228).

The reference is save-only (no resume path, SURVEY §5); here ``restore``
actually restores params + optimizer state + counters, enabling
checkpoint/resume."""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    epoch: int = 0, n_iters: int = 0,
                    extra: Optional[Dict] = None) -> None:
    """Write a full training checkpoint to ``path`` (a directory).

    Multi-host: only process 0 writes (params/opt state are replicated
    under the data-parallel mesh, so its local copy is the full state;
    every other process would race it on a shared filesystem), and ALL
    processes synchronize on a barrier after the write — without it,
    processes 1..n would return instantly and could restore a partial
    checkpoint that process 0 is still serializing.  The reference has
    no multi-process story at all (SURVEY §2 parallelism table) — this
    is the DCN-side discipline that replaces it.
    """
    if jax.process_index() == 0:
        path = os.path.abspath(path)
        payload = {
            "params": jax.device_get(params),
            "epoch": epoch,
            "n_iters": n_iters,
        }
        if opt_state is not None:
            payload["opt_state"] = jax.device_get(opt_state)
        if extra:
            payload["extra"] = extra
        _checkpointer().save(path, payload, force=True)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("sod_tpu_ckpt_save")


class AsyncSaver:
    """Overlapped checkpoint writes (``Config.async_checkpoint``).

    ``save()`` snapshots by REFERENCE — jax arrays are immutable and the
    train step does not donate its inputs, so the passed pytrees stay
    valid bit-exact snapshots while the next epoch rebinds
    ``self.params`` — and runs the full ``save_checkpoint`` (device_get
    + orbax write, the per-epoch cost on a slow-link host) on a writer
    thread.  One save in flight at a time: a new ``save`` joins the
    previous one first (ordering; also caps the extra host RAM at one
    fetched state).  The thread is NON-daemon, so normal interpreter
    exit waits for the last write; a SIGKILL cannot corrupt anything
    because orbax finalizes via tmp-dir + atomic rename — the previous
    checkpoint survives, which WEAKENS durability by at most one epoch
    vs the synchronous default (the resume contract is unchanged:
    restore sees the last COMPLETED write).  Multi-host: every process
    calls ``save`` (process 0 writes, the others only barrier), so the
    in-thread ``sync_global_devices`` pairs up across processes exactly
    as the synchronous path does.
    """

    def __init__(self):
        self._thread = None

    def save(self, path: str, params: Any, opt_state: Any = None,
             **kw) -> None:
        import threading

        self.wait()
        self._thread = threading.Thread(
            target=save_checkpoint, args=(path, params, opt_state),
            kwargs=kw, daemon=False, name="ckpt-writer")
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight save (if any) is durable."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Dict:
    """Restore a checkpoint saved by ``save_checkpoint``.

    :param template: optional pytree with the same structure/dtypes to
        restore into (required for exact dtype restoration of bf16 params).
    """
    path = os.path.abspath(path)
    if template is not None:
        return _checkpointer().restore(path, item=template)
    return _checkpointer().restore(path)
