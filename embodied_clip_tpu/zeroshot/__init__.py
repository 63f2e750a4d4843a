"""Zero-shot ObjectNav via frozen CLIP text-goal embeddings.

The reference's zeroshot-objectnav branch swaps the policy's learned object-type
embedding for frozen CLIP text-encoder embeddings of the class names, trains DD-PPO on
8 seen classes, and evaluates on 4 unseen ones (readme_files/zeroshot_objectnav.md:
3-8, 31-32). Here: build a (num_classes, D) normalized text-embedding table once,
condition the policy with goal_kind='text_embed' (stop_gradient keeps CLIP frozen),
and map integer goal ids → table rows inside the jitted rollout.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from embodied_clip_tpu.constants import (
    ROBOTHOR_OBJECT_TYPES,
    ZEROSHOT_SEEN_OBJECTS,
    ZEROSHOT_UNSEEN_OBJECTS,
)

__all__ = [
    "text_goal_table", "goal_map_fn", "seen_unseen_class_ids",
    "DEFAULT_PROMPT",
]

DEFAULT_PROMPT = "a photo of a {}."


def text_goal_table(clip_built, tokenizer, class_names: Sequence[str],
                    prompt: str = DEFAULT_PROMPT, context_length: int = 77) -> np.ndarray:
    """Encode class names with the frozen CLIP text tower → (C, D) L2-normalized."""
    from embodied_clip_tpu.models.tokenizer import tokenize

    texts = [prompt.format(n.lower()) for n in class_names]
    tokens = tokenize(texts, tokenizer, context_length=context_length, truncate=True)
    emb = clip_built.module.apply(
        clip_built.variables, jnp.asarray(tokens), method="encode_text"
    )
    emb = np.asarray(emb, dtype=np.float32)
    return emb / np.linalg.norm(emb, axis=-1, keepdims=True)


def goal_map_fn(table: np.ndarray) -> Callable:
    """goal ids (B,) int → (B, D) embeddings; jit-traceable table lookup."""
    t = jnp.asarray(table)

    def fn(goal_ids):
        return t[goal_ids.astype(jnp.int32)]

    return fn


def seen_unseen_class_ids(class_names: Optional[Sequence[str]] = None):
    """Index the zero-shot seen/unseen split into a class-name vocabulary."""
    names = list(class_names or ROBOTHOR_OBJECT_TYPES)
    seen = tuple(names.index(n) for n in ZEROSHOT_SEEN_OBJECTS if n in names)
    unseen = tuple(names.index(n) for n in ZEROSHOT_UNSEEN_OBJECTS if n in names)
    return seen, unseen
