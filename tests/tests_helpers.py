"""Shared tiny tokenizer helper for engine tests."""


class ByteTok:
    eos_token_id = 0
    bos_token_id = None

    def encode(self, text, **kw):
        return list(text.encode("utf-8"))

    def decode(self, ids):
        return bytes(i for i in ids if 0 <= i < 256).decode("utf-8", "replace")

    def is_eos(self, t):
        return t == 0

    @property
    def vocab_size(self):
        return 256

    def vocab_bytes(self):
        out = [bytes([i]) for i in range(256)]
        out[0] = b""
        return out
