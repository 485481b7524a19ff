"""Optional wandb metric hook.

The reference's observability backbone is wandb (``lt_model.py:122-127``,
``train.py:191-210``); this build logs JSONL unconditionally (works in
zero-egress environments) and attaches wandb only when the library is
importable and the caller opts in — the hook plugs into
``Trainer(metric_hook=...)`` with the same ``tr/*``/``val/*`` taxonomy.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional


def maybe_wandb_hook(project: str, run_name: Optional[str], config: Dict) -> Optional[Callable[[int, Dict], None]]:
    """Returns a ``(step, metrics) -> None`` hook, or None if wandb is absent."""
    try:
        import wandb  # noqa: F401
    except ImportError:
        return None
    import wandb

    run = wandb.init(project=project, name=run_name, config=config)

    def hook(step: int, metrics: Dict) -> None:
        run.log({k: v for k, v in metrics.items() if k != "step"}, step=step)

    return hook
