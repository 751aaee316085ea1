// Compile+link probe for the system libavcodec (see Makefile). Kept as
// a real source file: generating it inline via $(shell printf ...) is
// fragile — GNU make >= 4.3 passes "\#" through verbatim inside
// function calls, which silently broke the probe (and with it every
// compressed-codec fast path) on this toolchain.
extern "C" {
#include <libavcodec/avcodec.h>
}

int main() {
  avcodec_version();
  return 0;
}
