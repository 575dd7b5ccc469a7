"""Caption templating + tokenization.

Caption = template.format(location=..., description=...) with one trailing
null ("") caption per batch for CFG (ref:magicdrive/dataset/utils.py:28-49;
template ref:configs/dataset/Nuscenes.yaml:9).

The real CLIP BPE tokenizer is loaded from a local vocab when available
(transformers CLIPTokenizer); tests and offline environments use
``HashTokenizer``, which is deterministic and shape-compatible (77 tokens,
BOS/EOS/pad semantics) but not vocabulary-compatible.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

DEFAULT_TEMPLATE = "A driving scene image at {location}. {description}."
MAX_LENGTH = 77
BOS, EOS = 49406, 49407


class HashTokenizer:
    """Deterministic stand-in tokenizer with CLIP-compatible framing."""

    model_max_length = MAX_LENGTH

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = np.full((len(texts), MAX_LENGTH), EOS, np.int32)
        for i, t in enumerate(texts):
            words = t.lower().split()[: MAX_LENGTH - 2]
            ids = [BOS] + [hash(w) % 49000 + 300 for w in words] + [EOS]
            out[i, : len(ids)] = ids
        return out


def load_clip_tokenizer(path: Optional[str] = None):
    """Load the real CLIP BPE tokenizer from a vocab directory.

    ``path`` is a directory containing ``vocab.json`` + ``merges.txt`` (the
    SD-v1.5 tokenizer layout). Uses the native BPE implementation
    (:mod:`magicdrive_tpu.data.bpe`); no transformers dependency. ``None``
    returns the offline stand-in.
    """
    if path is None:
        return HashTokenizer()
    import os

    from .bpe import CLIPBPETokenizer

    return CLIPBPETokenizer.from_files(
        os.path.join(path, "vocab.json"), os.path.join(path, "merges.txt"))


def format_caption(template: str, metas: dict) -> str:
    return template.format(**metas)


def tokenize_captions(metas_list: List[dict], tokenizer,
                      template: str = DEFAULT_TEMPLATE):
    """Returns (input_ids (B, 77), uncond_ids (1, 77))."""
    captions = [format_caption(template, m) for m in metas_list]
    ids = tokenizer(captions + [""])
    return ids[:-1], ids[-1:]
