from .modeltrain import ar1_train, modeltrain, theils_u_ar1

__all__ = ["modeltrain", "ar1_train", "theils_u_ar1"]
