"""Bloblang expression language for bento_ray.

A from-scratch compiler + interpreter for the reference's mapping
language (internal/bloblang/): ``compile_mapping`` parses a mapping
string once; the resulting ``Mapping`` executes per message or per
batch, and ``mapping_stage`` runs it distributed inside
``Dataset.map_batches``.
"""

from bento_ray.blobl.interp import (  # noqa: F401
    Mapping, Message, compile_mapping,
)
from bento_ray.blobl.parser import parse_mapping, parse_query  # noqa: F401
from bento_ray.blobl.values import (  # noqa: F401
    DELETE, NOTHING, BloblangError, go_json_dumps,
)
