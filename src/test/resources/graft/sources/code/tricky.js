var a = 1; // see /* below
var b = 2;
var c = 3; /* real block
still inside */ var d = 4;
