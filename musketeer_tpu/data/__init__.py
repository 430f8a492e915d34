from .file_dataset import FileDataset
from .task_data import (
    CaptionBuilder, Example, GigawordBuilder, GlueBuilder, ImageClassifyBuilder,
    ImageGenBuilder, RefcocoBuilder, SnliVeBuilder, VqaBuilder, collate,
    parse_ref_dict, pre_caption, pre_question,
)

__all__ = [
    "FileDataset", "CaptionBuilder", "Example", "GigawordBuilder", "GlueBuilder",
    "ImageClassifyBuilder", "ImageGenBuilder", "RefcocoBuilder", "SnliVeBuilder",
    "VqaBuilder", "collate", "parse_ref_dict", "pre_caption", "pre_question",
]
from .detection import DetectionBuilder
from .pretrain import (
    ImageTextMatchingBuilder, ImageTextPairBuilder, PureImageBuilder,
    TextInfillingBuilder, VisualGroundingBuilder,
)
from .augment import RandAugment, horizontal_flip, large_scale_jitter, random_crop
