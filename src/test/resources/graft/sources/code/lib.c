/* Licensed under the Apache License, Version 2.0
 * spanning several lines
 */
#include <stdio.h>
int main() { /* inline */ return 0; }
/* open again
still inside
*/ int tail;
