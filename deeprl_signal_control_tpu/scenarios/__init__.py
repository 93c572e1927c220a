from .spec import NetworkSpec

SCENARIOS = {}


def register(name):
    def deco(fn):
        SCENARIOS[name] = fn
        return fn

    return deco


def build_scenario(name: str, env_config) -> NetworkSpec:
    """Build the compiled NetworkSpec for a scenario name (lazy imports)."""
    from . import small_grid, large_grid, real_net  # noqa: F401  (registration)

    if name not in SCENARIOS:
        raise KeyError(f"unknown scenario {name!r}; have {sorted(SCENARIOS)}")
    return SCENARIOS[name](env_config)
