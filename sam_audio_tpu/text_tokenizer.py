"""Host-side text tokenization for the T5 encoder.

The reference tokenizes with HF's T5 tokenizer (truncation 512, longest-pad,
reference: sam_audio/model/text_encoder.py:19-27). Tokenizers are host-side,
pre-jit work; we wrap HF's fast tokenizer when its files are available
locally and fall back to a deterministic byte-level tokenizer so the full
pipeline runs hermetically (tests, air-gapped TPU pods).
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def hub_reachable(timeout: float = 2.0) -> bool:
    """Fast pre-check before any ONLINE HuggingFace fallback.

    On air-gapped TPU hosts a cache-miss download pays ~40 s of internal
    retry backoff PER FILE before failing over to the hermetic fallbacks
    (~3 min for a tokenizer's file set). A bounded TCP connect to the hub's
    port answers the only question that matters — is the hub reachable at
    all — so the fallback engages immediately. A plain DNS resolve would
    lie on the common zero-egress topology where DNS answers but outbound
    TCP is blocked, and the resolver itself ignores socket timeouts, so the
    probe runs in a daemon thread joined with a hard deadline. Honors
    HF_HUB_OFFLINE/TRANSFORMERS_OFFLINE."""
    def _truthy(name: str) -> bool:
        # huggingface_hub accepts 1/true/yes/on — honor the same spellings,
        # or a physically-online host with HF_HUB_OFFLINE=true would probe
        # reachable and then crash in OfflineModeIsEnabled instead of
        # serving the local cache
        return os.environ.get(name, "").strip().lower() in (
            "1", "true", "yes", "on")

    if _truthy("HF_HUB_OFFLINE") or _truthy("TRANSFORMERS_OFFLINE"):
        return False
    import socket
    import threading
    from urllib.parse import urlsplit

    endpoint = os.environ.get("HF_ENDPOINT", "https://huggingface.co")
    if "://" not in endpoint:
        endpoint = "https://" + endpoint
    parts = urlsplit(endpoint)
    host = parts.hostname or "huggingface.co"
    port = parts.port or (80 if parts.scheme == "http" else 443)

    ok = []

    def _probe():
        try:
            s = socket.create_connection((host, port), timeout=timeout)
            s.close()
            ok.append(True)
        except OSError:
            pass

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout + 0.5)  # hard bound even if the libc resolver stalls
    return bool(ok)


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
            if not hub_reachable():
                raise
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


class RobertaBPETokenizer:
    """RoBERTa's GPT-2-style byte-level BPE, implemented from vocab.json +
    merges.txt (the CLAP text tokenizer; laion_clap tokenizes with HF
    RobertaTokenizer('roberta-base'), padding='max_length', max_length=77).

    Pure-Python and hermetic once the two vocabulary files are on disk
    (point SAM_AUDIO_ROBERTA_TOKENIZER at a directory containing them).
    Special ids follow roberta-base: <s>=0, <pad>=1, </s>=2, <unk>=3.
    """

    bos_id, pad_id, eos_id, unk_id = 0, 1, 2, 3

    def __init__(self, vocab: dict, merges: list):
        self.encoder = vocab
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = _bytes_to_unicode()
        self._cache: dict = {}
        import regex

        self.pat = regex.compile(
            r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
            r"|\s+(?!\S)|\s+"
        )

    @classmethod
    def from_files(cls, vocab_json: str, merges_txt: str):
        import json

        with open(vocab_json, encoding="utf-8") as f:
            vocab = json.load(f)
        merges = []
        with open(merges_txt, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#version"):
                    continue
                merges.append(tuple(line.split(" ")))
        return cls(vocab, merges)

    @classmethod
    def from_dir(cls, path: str):
        import os

        return cls.from_files(os.path.join(path, "vocab.json"),
                              os.path.join(path, "merges.txt"))

    def _bpe(self, token: str) -> list:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 62))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        out = list(word)
        self._cache[token] = out
        return out

    def encode_text(self, text: str) -> List[int]:
        ids: List[int] = []
        for token in self.pat.findall(text):
            mapped = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            for piece in self._bpe(mapped):
                ids.append(self.encoder.get(piece, self.unk_id))
        return ids

    def __call__(self, texts: Sequence[str], max_length: Optional[int] = 77,
                 pad_to_max: bool = True) -> Tuple[np.ndarray, np.ndarray]:
        seqs = []
        for t in texts:
            ids = self.encode_text(t)
            if max_length is not None:
                ids = ids[: max_length - 2]
            seqs.append([self.bos_id] + ids + [self.eos_id])
        if pad_to_max and max_length is not None:
            longest = max_length
        else:
            longest = max(len(s) for s in seqs) if seqs else 2
        ids_arr = np.full((len(seqs), longest), self.pad_id, np.int32)
        mask = np.zeros((len(seqs), longest), bool)
        for i, s in enumerate(seqs):
            ids_arr[i, : len(s)] = s
            mask[i, : len(s)] = True
        return ids_arr, mask


def _bytes_to_unicode() -> dict:
    """GPT-2's reversible byte <-> printable-unicode map."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def get_roberta_tokenizer(vocab_size: int = 50265,
                          allow_fallback: bool = False):
    """Best tokenizer available for the CLAP text tower: in-repo/env BPE files
    -> locally-cached HF roberta-base -> hermetic byte fallback.

    The byte fallback is NOT vocabulary-compatible with RoBERTa: with real
    CLAP weights it would silently score garbage token ids, so it is gated
    the same way random tower weights are (reference always tokenizes with
    the real HF tokenizer, sam_audio/ranking/clap.py:30). Callers with real
    weights get a RuntimeError with staging instructions; tests/benchmarks
    on random towers opt in with allow_fallback=True."""
    import os

    for cand in (os.environ.get("SAM_AUDIO_ROBERTA_TOKENIZER"),
                 os.path.join(os.path.dirname(__file__), "assets",
                              "roberta_tokenizer")):
        # require the FULL file set: a partially-staged dir (vocab.json but
        # no merges.txt) must fall through to the HF cache / the gate below
        # instead of crashing outside the allow_fallback policy
        if cand and all(os.path.exists(os.path.join(cand, f))
                        for f in ("vocab.json", "merges.txt")):
            return RobertaBPETokenizer.from_dir(cand)
    try:
        from transformers import AutoTokenizer

        tok = HFTokenizer.__new__(HFTokenizer)
        # local cache only — no network retries on air-gapped hosts
        tok.tok = AutoTokenizer.from_pretrained("roberta-base",
                                                local_files_only=True)
        return tok
    except Exception:
        if not allow_fallback:
            raise RuntimeError(
                "No RoBERTa tokenizer is available: stage vocab.json + "
                "merges.txt (point SAM_AUDIO_ROBERTA_TOKENIZER at the "
                "directory, or cache HF 'roberta-base' locally). Real CLAP "
                "weights with the byte fallback tokenizer would silently "
                "condition on garbage token ids — the reference always uses "
                "the real HF tokenizer (sam_audio/ranking/clap.py:30). Pass "
                "allow_fallback=True only with randomly-initialized towers."
            )
    logger.warning(
        "Falling back to the hermetic ByteFallbackTokenizer for RoBERTa — "
        "NOT vocabulary-compatible; use only with random-init text towers."
    )
    return ByteFallbackTokenizer(vocab_size)


def get_text_tokenizer(cfg_or_name, prefer_hf: bool = True,
                       allow_fallback: bool = False):
    """T5 text tokenizer: HF (local cache first) -> hermetic byte fallback.

    The fallback is gated exactly like random tower weights: with a real
    converted checkpoint the model must never silently condition on byte-
    level token ids (the reference always tokenizes with the real HF T5
    tokenizer, sam_audio/model/text_encoder.py:14-15)."""
    name = getattr(cfg_or_name, "name", cfg_or_name)
    vocab = getattr(cfg_or_name, "vocab_size", 32128)
    if prefer_hf:
        try:
            return HFTokenizer(name)
        except Exception:
            pass  # gated below, exactly like the prefer_hf=False path
    # The gate applies to EVERY route to the byte fallback, including
    # prefer_hf=False — a caller with real weights must never silently
    # condition on byte-level token ids.
    if not allow_fallback:
        raise RuntimeError(
            f"No tokenizer for '{name}' is available locally and the "
            "hub is unreachable. Stage the HF tokenizer files (e.g. "
            "`huggingface-cli download t5-base` on a connected host, "
            "then ship the cache) — the reference always loads the "
            "real T5 tokenizer (sam_audio/model/text_encoder.py:14-15)"
            ". The byte-level fallback would silently condition the "
            "model on garbage token ids; pass allow_fallback=True "
            "(or allow_random_towers=True on the model) only with "
            "randomly-initialized text towers."
        )
    logger.warning(
        "Falling back to the hermetic ByteFallbackTokenizer for '%s' — "
        "NOT vocabulary-compatible; use only with random-init text "
        "towers.", name,
    )
    return ByteFallbackTokenizer(vocab)
