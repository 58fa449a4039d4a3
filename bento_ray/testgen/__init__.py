from bento_ray.testgen.pages import (
    ensure_pages_dataset,
    generate_pages_table,
    lang_info_table,
    lang_updates_table,
    make_pages_batch_fn,
)

__all__ = [
    "generate_pages_table",
    "ensure_pages_dataset",
    "lang_info_table",
    "lang_updates_table",
    "make_pages_batch_fn",
]
