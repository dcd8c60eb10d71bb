"""Host-side text tokenization for the T5 encoder.

The reference tokenizes with HF's T5 tokenizer (truncation 512, longest-pad,
reference: sam_audio/model/text_encoder.py:19-27). Tokenizers are host-side,
pre-jit work; we wrap HF's fast tokenizer when its files are available
locally and fall back to a deterministic byte-level tokenizer so the full
pipeline runs hermetically (tests, air-gapped TPU pods).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


class HFTokenizer:
    def __init__(self, name_or_path: str):
        from transformers import AutoTokenizer

        try:
            # local/cached first: avoids long network-retry stalls on
            # air-gapped TPU hosts
            self.tok = AutoTokenizer.from_pretrained(
                name_or_path, local_files_only=True
            )
        except Exception:
            self.tok = AutoTokenizer.from_pretrained(name_or_path)

    def __call__(self, texts: Sequence[str], max_length: Optional[int] = 512
                 ) -> Tuple[np.ndarray, np.ndarray]:
        enc = self.tok(
            list(texts), truncation=max_length is not None, max_length=max_length,
            padding="longest", return_tensors="np",
        )
        return (enc["input_ids"].astype(np.int32),
                enc["attention_mask"].astype(bool))


class ByteFallbackTokenizer:
    """Deterministic byte-level tokenizer (hermetic fallback).

    Maps UTF-8 bytes to ids [3, 258] with T5-style conventions: pad=0, eos=1
    appended. Not vocabulary-compatible with T5 — use only with randomly
    initialized text encoders (tests/benchmarks), never with converted
    checkpoints.
    """

    pad_id = 0
    eos_id = 1

    def __init__(self, vocab_size: int = 32128):
        self.vocab_size = vocab_size

    def __call__(self, texts: Sequence[str], max_length: Optional[int] = 512
                 ) -> Tuple[np.ndarray, np.ndarray]:
        seqs: List[List[int]] = []
        for t in texts:
            ids = [3 + (b % min(self.vocab_size - 3, 256))
                   for b in t.encode("utf-8")]
            if max_length is not None:
                ids = ids[: max_length - 1]
            ids.append(self.eos_id)
            seqs.append(ids)
        longest = max(len(s) for s in seqs) if seqs else 1
        ids_arr = np.full((len(seqs), longest), self.pad_id, np.int32)
        mask = np.zeros((len(seqs), longest), bool)
        for i, s in enumerate(seqs):
            ids_arr[i, : len(s)] = s
            mask[i, : len(s)] = True
        return ids_arr, mask


def get_text_tokenizer(cfg_or_name, prefer_hf: bool = True):
    name = getattr(cfg_or_name, "name", cfg_or_name)
    vocab = getattr(cfg_or_name, "vocab_size", 32128)
    if prefer_hf:
        try:
            return HFTokenizer(name)
        except Exception:
            pass
    return ByteFallbackTokenizer(vocab)
