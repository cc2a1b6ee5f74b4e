from . import (  # noqa: F401
    correlation, droplet, free_energy, interface, msd, stats, structfact)
