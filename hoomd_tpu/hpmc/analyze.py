"""hpmc.analyze — placeholder module; implementations land later this round."""
