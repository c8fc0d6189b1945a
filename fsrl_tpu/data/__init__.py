"""Data layer (reference L2, ``fsrl/data/``): jitted rollout collector,
device-resident replay ring, episode-exact evaluation, trajectory store."""
