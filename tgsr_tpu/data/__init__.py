from tgsr_tpu.data.tokenizer import (  # noqa: F401
    tokenize_caption,
    build_dictionary,
    encode_caption,
    Vocab,
)
from tgsr_tpu.data.datasets import (  # noqa: F401
    TextDataset,
    TextFaceDataset,
    TextFlowerDataset,
    TextExampleSRDataset,
    prepare_batch,
)
from tgsr_tpu.data.pipeline import BatchLoader, device_preprocess  # noqa: F401
