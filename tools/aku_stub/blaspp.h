#include "lapackpp.h"
