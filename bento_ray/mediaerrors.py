"""Shared media-codec exception type.

Leaf module (no intra-package imports) so mediacodec.py and
jpegcodec.py can both raise/catch the SAME class regardless of which
is imported first — a module-bottom rebinding scheme broke when
jpegcodec was imported before mediacodec (the circular import aborted
mid-module and the two classes stayed distinct, so
``except mediacodec.MediaDecodeError`` missed JPEG errors).
"""


class MediaDecodeError(ValueError):
    """A media payload could not be decoded by the pure-Python codecs.

    Subclasses ValueError so legacy ``except ValueError`` call sites
    keep working."""
