"""Shared tiny tokenizer helper for engine tests."""


from blazr_tpu.tokenizer.byte_tok import ByteTokenizer as ByteTok  # noqa: F401,E402
