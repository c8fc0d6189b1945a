"""Network zoo (reference tianshou ``Net``/``ActorProb``/``Critic``
surface): MLP actors/critics and action distributions, flax.linen."""
