from pacednegatives_tpu.data.tokenizer import (
    Tokenizer,
    HashTokenizer,
    TrainedTokenizer,
)
from pacednegatives_tpu.data.corpus import TextCorpus
from pacednegatives_tpu.data.triples import TripletStore, load_triples
from pacednegatives_tpu.data.pipeline import TokenizedStore, PromptTemplate
from pacednegatives_tpu.data.device_corpus import DeviceCorpus
from pacednegatives_tpu.data.streaming import (
    build_streaming_store,
    stream_tokenize,
)

__all__ = [
    "build_streaming_store",
    "stream_tokenize",
    "Tokenizer",
    "HashTokenizer",
    "TrainedTokenizer",
    "TextCorpus",
    "TripletStore",
    "load_triples",
    "TokenizedStore",
    "PromptTemplate",
    "DeviceCorpus",
]
