"""Config layer (reference L5, ``fsrl/config/``): per-algorithm TrainCfg
dataclasses, env-suite presets, task registry, and the CLI/yaml front end."""
