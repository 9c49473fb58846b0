from .self_critical import (array_to_str, get_scores,
                            get_self_cider_scores,
                            get_self_critical_reward, init_scorer)
