"""hpmc.data — placeholder module; implementations land later this round."""
