from .types import FinishReason, GeneratedToken, GenerationResult, TokenLogprob, is_valid_json
