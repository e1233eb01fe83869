from .log import get_logger, setup_logging
from .hashing import stable_hash32, stable_hash64, content_etag, md5_hex

__all__ = ["get_logger", "setup_logging", "stable_hash32", "stable_hash64", "content_etag", "md5_hex"]
