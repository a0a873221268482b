from .mlm import IGNORE_INDEX, mask_tokens
from .prompts import class_map, get_class_names, get_templates, template_map
from .registry import ELEVATER_DATASETS, DatasetInfo, get_dataset_info
from .sampling import class_balanced_val_split, sample_few_shot_subset
from .sources import ArrayDataset, build_splits, load_split
from .tokenizer import ClipTokenizer, get_tokenizer, tokenize
from .transforms import CLIP_MEAN, CLIP_STD, preprocess_batch, resize_center_crop

__all__ = [
    "ArrayDataset",
    "CLIP_MEAN",
    "CLIP_STD",
    "ClipTokenizer",
    "DatasetInfo",
    "ELEVATER_DATASETS",
    "build_splits",
    "class_balanced_val_split",
    "class_map",
    "get_class_names",
    "get_dataset_info",
    "get_templates",
    "get_tokenizer",
    "IGNORE_INDEX",
    "load_split",
    "mask_tokens",
    "preprocess_batch",
    "resize_center_crop",
    "sample_few_shot_subset",
    "template_map",
    "tokenize",
]
