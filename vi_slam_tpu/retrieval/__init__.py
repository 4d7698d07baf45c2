from vi_slam_tpu.retrieval.vocabulary import (  # noqa: F401
    Vocabulary,
    train_vocabulary,
    transform,
    bow_vectors,
    score_l1,
)
from vi_slam_tpu.retrieval.database import KeyFrameDatabase  # noqa: F401
