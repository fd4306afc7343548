"""Native checkpointing (Orbax) + auto-resume.

The TPU-native replacement for the reference's torch-dict checkpoints
(``lib/utils/utils.py:107-215``): the same logical contents
(step/epoch, model params, optimizer state, perf) stored as an Orbax
composite with async save, plus ``AUTO_RESUME`` pickup of the latest step.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
        ),
    )


class CheckpointManager:
    """Save/restore of ``{params, opt_state, step, epoch, perf}``."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        self.mgr = _manager(directory, max_to_keep)

    def save(self, step: int, params, opt_state=None,
             extra: Optional[dict] = None, force: bool = False,
             shadows: Optional[dict] = None):
        """``force=True`` REPLACES an existing checkpoint at ``step``
        (the epoch-end save when TRAIN.SAVE_EVERY_STEPS coincides with
        the epoch's last step — the epoch-end metadata must win so
        resume starts the NEXT epoch). Orbax's own ``force`` flag does
        NOT overwrite (it raises StepAlreadyExistsError), so replace =
        wait for in-flight saves, delete, save.

        ``shadows``: optional extra param trees saved alongside
        (``{"ema": tree, "swa": tree}``) so preemption resume can
        restore the EMA/SWA state instead of re-anchoring it to the
        current weights."""
        if force:
            # wait FIRST: an async save at this step still in flight is
            # not yet in all_steps(), but orbax's save() would wait for
            # it internally and then raise StepAlreadyExistsError
            self.mgr.wait_until_finished()
            if step in (self.mgr.all_steps() or []):
                self.mgr.delete(step)
        items = {"params": ocp.args.StandardSave(params)}
        if opt_state is not None:
            items["opt_state"] = ocp.args.StandardSave(opt_state)
        for name, tree in (shadows or {}).items():
            if tree is not None:
                items[name] = ocp.args.StandardSave(tree)
        if extra:
            items["extra"] = ocp.args.JsonSave(extra)
        self.mgr.save(step, args=ocp.args.Composite(**items))

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, step: Optional[int] = None, params_template=None,
                opt_state_template=None, shadow_templates=None):
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        items = {}
        if params_template is not None:
            items["params"] = ocp.args.StandardRestore(params_template)
        if opt_state_template is not None:
            items["opt_state"] = ocp.args.StandardRestore(opt_state_template)
        # shadow trees (ema/swa) are only present when they were saved;
        # request each only if the checkpoint carries it
        saved_items = set()
        try:
            meta = self.mgr.item_metadata(step)
            saved_items = set(getattr(meta, "keys", lambda: [])()) or set(
                k for k in ("ema", "swa") if getattr(meta, k, None)
                is not None
            )
        except Exception as e:  # orbax API drift / transient FS error
            logging.warning(
                f"=> checkpoint item metadata unavailable at step {step} "
                f"({e!r}); EMA/SWA shadows will NOT be restored"
            )
        for name, template in (shadow_templates or {}).items():
            if template is not None and name in saved_items:
                items[name] = ocp.args.StandardRestore(template)
        items["extra"] = ocp.args.JsonRestore()
        try:
            restored = self.mgr.restore(step, args=ocp.args.Composite(**items))
        except Exception:
            # checkpoint without 'extra'
            items.pop("extra")
            restored = self.mgr.restore(step, args=ocp.args.Composite(**items))
        out = dict(restored)
        out["step"] = step
        return out

    def wait(self):
        self.mgr.wait_until_finished()

    def close(self):
        self.mgr.close()


def save_params(path: str, params):
    """One-shot params-only save (model export)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def restore_params(path: str, model):
    """Restore a params-only checkpoint saved by ``save_params``."""
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0))
    )
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), template)
    ckptr.close()
    return restored


def auto_resume(manager: CheckpointManager, params, opt_state,
                shadow_templates=None):
    """``TRAIN.AUTO_RESUME`` semantics (``lib/utils/utils.py:117-127``):
    pick up the latest checkpoint if one exists, else return inputs.
    ``shadow_templates``: ``{"ema": tree, "swa": tree}`` templates —
    restored shadows come back under the 'shadows' key of ``extra``'s
    sibling return (see tools/train.py)."""
    step = manager.latest_step()
    if step is None:
        return params, opt_state, 0, {}
    restored = manager.restore(
        step, params_template=params, opt_state_template=opt_state,
        shadow_templates=shadow_templates,
    )
    logging.info(f"=> auto-resumed from step {step}")
    extra = dict(restored.get("extra") or {})
    shadows = {
        name: restored[name]
        for name in (shadow_templates or {})
        if restored.get(name) is not None
    }
    if shadows:
        extra["shadows"] = shadows
    return restored["params"], restored.get("opt_state", opt_state), step, extra
