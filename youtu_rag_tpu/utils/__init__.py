from .log import get_logger, setup_logging
from .hashing import stable_hash32, stable_hash64, content_etag, md5_hex
from .cache import async_file_cache

__all__ = ["async_file_cache", "content_etag", "get_logger", "md5_hex", "setup_logging", "stable_hash32", "stable_hash64"]
