"""hpmc.integrate — placeholder module; implementations land later this round."""
