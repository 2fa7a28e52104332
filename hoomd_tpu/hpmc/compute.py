"""hpmc.compute — placeholder module; implementations land later this round."""
