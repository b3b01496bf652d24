from .logger import (  # noqa: F401
    get_logger,
    log_every_n,
    log_every_n_seconds,
    log_first_n,
    setup_logger,
)
