from .binary_fluid import (  # noqa: F401
    compute_hydro,
    init_checkpoint,
    init_droplet,
    init_mixture,
    init_stripe,
    make_initial_state,
    prelude,
    step,
)
