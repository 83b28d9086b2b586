"""Tokenizer integration.

The reference has NO tokenizer: prompt token ids are hardcoded
(reference: layers/src/iengine.cu:325) and were produced offline with a
HF tokenizer experiment (layers/src/temp.py).  Here tokenization is a
first-class engine input: a HF tokenizer loaded from local checkpoint
files when available, with a deterministic byte-level fallback so the
engine (and tests/benches on hosts without checkpoint files) always has a
working round-trip tokenizer.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence


class ByteTokenizer:
    """Deterministic byte-level fallback: one token per UTF-8 byte, offset
    by the number of special tokens. Round-trips any text."""

    SPECIALS = {"<pad>": 0, "<eos>": 1, "<im_start>": 2, "<im_end>": 3}

    def __init__(self):
        self.vocab_size = 256 + len(self.SPECIALS)
        self.eos_token_id = self.SPECIALS["<eos>"]
        self.pad_token_id = self.SPECIALS["<pad>"]

    def encode(self, text: str) -> List[int]:
        off = len(self.SPECIALS)
        return [b + off for b in text.encode("utf-8")]

    def decode(self, ids: Sequence[int]) -> str:
        off = len(self.SPECIALS)
        data = bytes(i - off for i in ids if off <= i < off + 256)
        return data.decode("utf-8", errors="replace")

    def apply_chat_template(self, messages, add_generation_prompt=True, **kw) -> str:
        out = []
        for m in messages:
            out.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
        if add_generation_prompt:
            out.append("<|im_start|>assistant\n")
        return "".join(out)


class HFTokenizer:
    """Thin wrapper over a local HuggingFace tokenizer (no network)."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        self.vocab_size = len(self._tok)
        self.eos_token_id = self._tok.eos_token_id
        self.pad_token_id = self._tok.pad_token_id or self._tok.eos_token_id

    def encode(self, text: str) -> List[int]:
        return self._tok.encode(text, add_special_tokens=False)

    def decode(self, ids: Sequence[int]) -> str:
        return self._tok.decode(ids, skip_special_tokens=True)

    def apply_chat_template(self, messages, add_generation_prompt=True, **kw) -> str:
        return self._tok.apply_chat_template(
            messages, tokenize=False,
            add_generation_prompt=add_generation_prompt, **kw,
        )


def load_tokenizer(path_or_name: Optional[str] = None):
    """HF tokenizer if local files exist, else the byte fallback."""
    if path_or_name and os.path.isdir(path_or_name):
        for f in ("tokenizer.json", "tokenizer_config.json", "vocab.json"):
            if os.path.exists(os.path.join(path_or_name, f)):
                try:
                    return HFTokenizer(path_or_name)
                except Exception:
                    break
    return ByteTokenizer()


class StreamDecoder:
    """Incremental detokenizer for streaming responses.

    ``decode([tok])`` per token is wrong for byte-level BPE: a multi-byte
    UTF-8 character can span tokens, so per-token decodes emit U+FFFD
    replacement characters mid-stream. This decodes the FULL id sequence
    each push and emits only the stable suffix delta, holding back text
    that still ends in a replacement character (a partial code point that
    the next token may complete).
    """

    _WINDOW = 256  # ids re-decoded per push (bounds cost for long streams)

    def __init__(self, tok):
        self._tok = tok
        self._ids: List[int] = []
        self._start = 0      # window start (advanced at clean boundaries)
        self._emitted = 0    # chars of decode(ids[start:]) already emitted

    def push(self, token_id: int) -> str:
        self._ids.append(token_id)
        text = self._tok.decode(self._ids[self._start:])
        # hold back a trailing partial code point; emit it once completed
        # (or at flush). A genuine U+FFFD in the vocab is delayed by one
        # token, never lost.
        end = len(text)
        while end > self._emitted and text[end - 1] == "�":
            end -= 1
        delta = text[self._emitted:end]
        self._emitted = end
        # re-decoding the full history is O(n^2) over a generation; once
        # everything is emitted (no held-back chars) the boundary is clean
        # and the window can restart. Keep a small id OVERLAP across the
        # restart: SentencePiece-style tokenizers strip/join at sequence
        # starts, so a zero-context restart could corrupt a leading space
        # or merge once per window (advisor r3); with the overlap the
        # next token always decodes with context, and _emitted re-bases
        # to the overlap's own rendering so deltas stay consistent.
        if (len(self._ids) - self._start > self._WINDOW
                and self._emitted == len(text)):
            keep = 8
            self._start = max(0, len(self._ids) - keep)
            self._emitted = len(self._tok.decode(self._ids[self._start:]))
        return delta

    def flush(self) -> str:
        text = self._tok.decode(self._ids[self._start:])
        delta = text[self._emitted:]
        self._emitted = len(text)
        return delta
