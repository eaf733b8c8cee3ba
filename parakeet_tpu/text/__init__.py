from parakeet_tpu.text.tokenizer import Tokenizer

__all__ = ["Tokenizer"]
