"""Minimal OpenAI-CLIP shim for importing the MVSeg reference on CPU.

`MVSeg/DS_NeRF/run_nerf_helpers.py:469` calls `clip.load("ViT-B/32")` at
module import (the CLIP-guided mask utilities). The parity harness never
exercises those code paths (they require the downloaded ViT checkpoint),
but the import must succeed; this returns inert stand-ins with the same
call surface.
"""
import torch


class _DummyClipModel(torch.nn.Module):
    def encode_image(self, images):
        return torch.zeros(images.shape[0], 512)

    def encode_text(self, tokens):
        return torch.zeros(tokens.shape[0], 512)


def load(name, device=None, **kwargs):
    return _DummyClipModel(), (lambda img: img)


def tokenize(texts, **kwargs):
    if isinstance(texts, str):
        texts = [texts]
    return torch.zeros(len(texts), 77, dtype=torch.long)
