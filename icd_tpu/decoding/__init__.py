from .beam import (  # noqa: F401
    attention_caption_image_beam_search, beam_search, beam_search_batched)
from .greedy import greedy_decode_baseline  # noqa: F401
from .greedy_attention import greedy_decode_attention  # noqa: F401
