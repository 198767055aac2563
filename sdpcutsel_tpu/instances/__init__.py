from .boxqp import (  # noqa: F401
    BoxQPInstance,
    generate_spar,
    parse_boxqp,
    write_boxqp,
    suite_names,
    load_or_generate,
)
