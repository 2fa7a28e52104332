"""hpmc.util — placeholder module; implementations land later this round."""
