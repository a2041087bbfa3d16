from vqattack_tpu.text.tokenizer import WordPieceTokenizer  # noqa: F401
from vqattack_tpu.text.filter_words import default_filter_words  # noqa: F401
