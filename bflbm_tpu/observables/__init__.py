from . import droplet, free_energy, interface, msd, stats, structfact  # noqa: F401
