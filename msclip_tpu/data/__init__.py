from .tokenizer import ClipTokenizer, SimpleTokenizer
from .prompts import (
    ALL_CLASSES_DICT,
    ALL_TEMPLATES_DICT,
    get_classnames,
    get_templates,
)

__all__ = [
    "ClipTokenizer",
    "SimpleTokenizer",
    "ALL_CLASSES_DICT",
    "ALL_TEMPLATES_DICT",
    "get_classnames",
    "get_templates",
]
